"""Cross-SF linearity table (VERDICT r3 task #3): given two bench.py
JSON outputs at different scale factors, emit a per-query time-ratio
table annotated against the data-size ratio, flagging any query whose
wall-time ratio exceeds the data ratio by `slack` (a superlinearity
suspect at 100 TB).

At toy scale most queries are ROUND-LATENCY-BOUND (fixed per-job cost:
scheduling, planning, Python-worker round trips) rather than
data-bound, so ratios far BELOW the data ratio are expected and good;
only ratios far ABOVE it indicate a term growing faster than the data.

Usage: python scripts/sf_ratio.py small.json big.json out.md
"""

from __future__ import annotations

import json
import sys


def main():
    small_path, big_path, out_path = sys.argv[1:4]
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    data_ratio = big["sf"] / small["sf"]
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5

    rows = []
    for name, t_big in big["queries"].items():
        t_small = small["queries"].get(name)
        if t_small is None:
            continue
        ratio = t_big / max(t_small, 1e-9)
        rows.append((name, t_small, t_big, ratio))
    rows.sort(key=lambda r: -r[3])

    suspects = [r for r in rows if r[3] > data_ratio * slack]
    lines = [
        "# Cross-SF linearity (bench per-query wall ratios)",
        "",
        f"- small: sf={small['sf']} ({small['n_queries']} queries)",
        f"- big:   sf={big['sf']} ({big['n_queries']} queries)",
        f"- data-size ratio: {data_ratio:.0f}x; superlinearity flag "
        f"threshold: ratio > {data_ratio * slack:.0f}x (ratio <= "
        f"{data_ratio:.0f}x means at-worst-linear at this scale step; "
        "<<1x of it means round-latency-bound)",
        f"- suspects: {len(suspects)}"
        + (" — " + ", ".join(r[0] for r in suspects) if suspects else ""),
        "",
        "| query | sf_small s | sf_big s | ratio | vs data ratio |",
        "|---|---|---|---|---|",
    ]
    for name, ts, tb, ratio in rows:
        verdict = (
            "SUPERLINEAR?" if ratio > data_ratio * slack
            else "~linear" if ratio > data_ratio * 0.5
            else "sublinear/latency-bound"
        )
        lines.append(
            f"| {name} | {ts:.3f} | {tb:.3f} | {ratio:.2f}x | {verdict} |"
        )
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {len(rows)} queries, "
          f"{len(suspects)} superlinearity suspects")


if __name__ == "__main__":
    main()
