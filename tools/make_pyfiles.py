"""Build the spark-submit --py-files artifact: dist/resolve_spark.zip.

The zip contains the `resolve_spark` package exactly as executors need
it (pure-Python, no data files) so a cluster run is:

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/resolve_spark.zip tools/submit_pipeline.py \
        --input s3://.../files.parquet --out s3://.../clusters

Usage: python tools/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str) -> str:
    pkg = os.path.join(REPO, "resolve_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_zip)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, names in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(names):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "resolve_spark.zip")
    print(build(out))
