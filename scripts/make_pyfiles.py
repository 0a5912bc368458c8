"""Build the --py-files zip for spark-submit deployment.

    python scripts/make_pyfiles.py [dist/cloud_crawler_spark.zip]

Zips the cloud_crawler_spark package (source only, no tests/caches) so
executors can import it:

    spark-submit --py-files dist/cloud_crawler_spark.zip scripts/submit_crawl.py ...
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "cloud_crawler_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                # archive paths start at the package name so the zip
                # root is importable
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "cloud_crawler_spark.zip")
    print(build(out))
