"""Unigram-LM tokenizer (SentencePiece-style, Kudo 2018) and
margin-based bitext mining (Artetxe & Schwenk 2019) pinned against
pure-Python references:

* unigram_seed_vocab — exact match vs a naive substring-counting
  reference (same freq*len score, same tie-break);
* train_unigram — hard-EM Viterbi corpus log-likelihood is
  non-decreasing per round, and every trained word stays segmentable;
* mine_bitext exact path — same (src, tgt, margin) elections as a
  naive O(n*m) reference with the same k-NN normalization;
* mine_bitext LSH path — schema-identical, candidates honest (cos_sim
  exact for emitted pairs), recall vs the exact path pinned on a
  clustered corpus.
"""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.operators.bpe import (
    train_unigram,
    unigram_seed_vocab,
)
from cloud_crawler_spark.operators.similarity import mine_bitext

TEXTS = [
    "the lowest low lower lowering",
    "new newer newest news news",
    "wide wider widest widely",
    "the low new wide widely news",
    "lowering the newest lowest low",
    "a an as at it in on of",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


# ------------------------------------------------ pure-Python seed ref


def _ref_seed(texts, max_piece_len=4, min_count=2, vocab_size=200,
              max_word_len=16):
    wc = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and w.isalpha() and w == w.lower() and len(w) <= max_word_len:
                wc[w] += 1
    pc = Counter()
    for w, n in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                pc[w[i:i + ln]] += n
    scored = [
        (p, c, c * len(p)) for p, c in pc.items() if c >= min_count
    ]
    scored.sort(key=lambda x: (-x[2], x[0]))
    return [
        (p, c, s, r + 1) for r, (p, c, s) in enumerate(scored[:vocab_size])
    ]


def test_seed_vocab_matches_reference(spark, docs):
    got = sorted(
        (r["piece"], r["cnt"], r["score"], r["vrank"])
        for r in unigram_seed_vocab(docs, vocab_size=50).collect()
    )
    want = sorted(_ref_seed(TEXTS, vocab_size=50))
    assert got == want


def test_seed_vocab_scores_and_rank_dense(spark, docs):
    rows = unigram_seed_vocab(docs, vocab_size=30).collect()
    assert all(r["score"] == r["cnt"] * len(r["piece"]) for r in rows)
    assert sorted(r["vrank"] for r in rows) == list(range(1, len(rows) + 1))


# ---------------------------------------------------- hard-EM training


def test_train_unigram_ll_monotone(spark, docs):
    vocab, lls = train_unigram(docs, n_iters=3, vocab_size=60)
    assert len(lls) == 3
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls
    rows = vocab.collect()
    # a probability distribution over pieces
    assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-9
    assert all(r["prob"] > 0 for r in rows)
    # coverage floor: every corpus character survives as a piece
    chars = {c for t in TEXTS for w in t.split() for c in w}
    assert chars <= {r["piece"] for r in rows}


def test_train_unigram_zero_iters_is_seed_plus_floor(spark, docs):
    vocab, lls = train_unigram(docs, n_iters=0, vocab_size=40)
    assert lls == []
    assert vocab.count() >= 1


# ------------------------------------------------------- bitext mining


def _mk_vecs(n, dim, seed, cluster_of=None):
    rng = random.Random(seed)
    base = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(8)
    ]
    out = []
    for i in range(n):
        c = base[(cluster_of(i) if cluster_of else i) % 8]
        v = [x + rng.gauss(0, 0.15) for x in c]
        nrm = math.sqrt(sum(x * x for x in v))
        out.append([x / nrm for x in v])
    return out


def _ref_mine(svecs, tvecs, k, thresh):
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return round(num / (da * db), 6)

    scored = {
        (si, ti): cos(sv, tv)
        for si, sv in svecs.items() for ti, tv in tvecs.items()
    }
    s_avg, t_avg = {}, {}
    for si in svecs:
        tops = sorted(
            ((scored[(si, ti)], ti) for ti in tvecs),
            key=lambda x: (-x[0], x[1]))[:k]
        s_avg[si] = sum(c for c, _ in tops) / len(tops)
    for ti in tvecs:
        tops = sorted(
            ((scored[(si, ti)], si) for si in svecs),
            key=lambda x: (-x[0], x[1]))[:k]
        t_avg[ti] = sum(c for c, _ in tops) / len(tops)
    out = []
    for si in svecs:
        margin, ti = min(
            ((round(scored[(si, ti)] / (0.5 * (s_avg[si] + t_avg[ti])), 6),
              ti) for ti in tvecs),
            key=lambda x: (-x[0], x[1]))
        if margin >= thresh:
            out.append((si, ti, scored[(si, ti)], margin))
    return sorted(out)


@pytest.fixture(scope="module")
def bitext(spark):
    # pair 2m (src) with 2m+1 (tgt) in the same cluster so cosine
    # structure is real — without this, src/tgt clusters are disjoint
    # and margin elections are pure noise
    vecs = _mk_vecs(40, 12, seed=7, cluster_of=lambda i: i // 2)
    svecs = {i: vecs[i] for i in range(0, 40, 2)}
    tvecs = {i: vecs[i] for i in range(1, 40, 2)}
    src = spark.createDataFrame(
        [(i, v) for i, v in svecs.items()],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(i, v) for i, v in tvecs.items()],
        "vec_id long, embedding array<double>")
    return src, tgt, svecs, tvecs


def test_mine_bitext_exact_matches_reference(spark, bitext):
    src, tgt, svecs, tvecs = bitext
    got = sorted(
        (r["src_id"], r["tgt_id"], r["cos_sim"], r["margin"])
        for r in mine_bitext(src, tgt, k=4, margin_threshold=1.0).collect()
    )
    want = _ref_mine(svecs, tvecs, k=4, thresh=1.0)
    assert [(a, b) for a, b, _, _ in got] == [(a, b) for a, b, _, _ in want]
    for (_, _, gc, gm), (_, _, wc, wm) in zip(got, want):
        assert abs(gc - wc) < 1e-5
        assert abs(gm - wm) < 1e-5


def test_mine_bitext_one_row_per_source_max(spark, bitext):
    src, tgt, _, _ = bitext
    out = mine_bitext(src, tgt, k=4, margin_threshold=0.0).collect()
    ids = [r["src_id"] for r in out]
    assert len(ids) == len(set(ids))
    # threshold=0 keeps every source (cosines of unit vectors, margins > 0)
    assert len(ids) == src.count()


def test_mine_bitext_lsh_recall(spark, bitext):
    src, tgt, _, _ = bitext
    exact = {
        (r["src_id"], r["tgt_id"])
        for r in mine_bitext(src, tgt, k=4, margin_threshold=0.0).collect()
    }
    lsh_df = mine_bitext(
        src, tgt, k=4, margin_threshold=0.0,
        n_tables=8, planes_per_table=4,
    )
    assert lsh_df.columns == ["src_id", "tgt_id", "cos_sim", "margin"]
    lsh = {(r["src_id"], r["tgt_id"]) for r in lsh_df.collect()}
    # sparse banding: candidate-set-restricted k-NN normalizers shift
    # some margins (expected ANN behavior), but most elections hold
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.7, (recall, sorted(exact - lsh))
    # dense banding (4-bucket tables): candidates ~= all pairs, so the
    # margin elections converge to the exact path's
    dense = {
        (r["src_id"], r["tgt_id"])
        for r in mine_bitext(
            src, tgt, k=4, margin_threshold=0.0,
            n_tables=10, planes_per_table=2,
        ).collect()
    }
    assert dense == exact, sorted(exact ^ dense)


def test_mine_bitext_lsh_cosines_exact_for_emitted_pairs(spark, bitext):
    src, tgt, svecs, tvecs = bitext
    rows = mine_bitext(
        src, tgt, k=4, margin_threshold=0.0,
        n_tables=8, planes_per_table=4,
    ).collect()

    def cos(a, b):
        return round(
            sum(x * y for x, y in zip(a, b))
            / (math.sqrt(sum(x * x for x in a))
               * math.sqrt(sum(x * x for x in b))), 6)

    for r in rows:
        assert abs(r["cos_sim"] - cos(svecs[r["src_id"]],
                                      tvecs[r["tgt_id"]])) < 1e-5


# ------------------------------------- broadcast piece table (r5 #6)


def test_viterbi_broadcast_large_vocab(spark):
    """The Viterbi piece table rides an explicit sparkContext
    broadcast (not the pickled task closure): segment with a vocab of
    >12k pieces — larger than the default Arrow record batch (10k) and
    far past anything a closure should ship per task — passed as a
    Broadcast, and require byte-identical segmentations vs the plain
    closure-dict path and a per-word pure-Python reference."""
    import itertools

    from cloud_crawler_spark.operators.bpe import _viterbi_segment_udf

    rng = random.Random(7)
    # 12_500 distinct 3-char pieces + full single-char coverage so
    # every word stays segmentable
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    three = ["".join(t) for t in itertools.product(alphabet, repeat=3)]
    rng.shuffle(three)
    logp = {p: -rng.uniform(1.0, 20.0) for p in three[:12_500]}
    logp.update({c: -25.0 for c in alphabet})
    assert len(logp) > 12_000

    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 16)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")

    bcast = spark.sparkContext.broadcast(logp)
    seg_b = _viterbi_segment_udf(bcast, 4)
    seg_d = _viterbi_segment_udf(logp, 4)
    got_b = {r["word"]: r["p"]
             for r in df.withColumn("p", seg_b(F.col("word"))).collect()}
    got_d = {r["word"]: r["p"]
             for r in df.withColumn("p", seg_d(F.col("word"))).collect()}
    bcast.unpersist()
    assert got_b == got_d

    # per-word pure-Python Viterbi reference (shortest-final-piece ties)
    def ref(w):
        NEG = float("-inf")
        score = [NEG] * (len(w) + 1)
        back = [0] * (len(w) + 1)
        score[0] = 0.0
        for i in range(1, len(w) + 1):
            for ln in range(1, min(4, i) + 1):
                lp = logp.get(w[i - ln:i])
                if lp is None or score[i - ln] == NEG:
                    continue
                if score[i - ln] + lp > score[i]:
                    score[i], back[i] = score[i - ln] + lp, ln
        if score[len(w)] == NEG:
            return []
        out, i = [], len(w)
        while i > 0:
            out.append(w[i - back[i]:i])
            i -= back[i]
        return out[::-1]

    for w in words:
        assert got_b[w] == ref(w), w
