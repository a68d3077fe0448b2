"""Package batch3dfier_spark for spark-submit --py-files.

Produces dist/batch3dfier_spark.zip containing the package tree (no
tests, no caches). Cluster launch (north_rule deployment surface):

    spark-submit --master <cluster> \
        --py-files dist/batch3dfier_spark.zip \
        tools/submit_job.py job.yml

Smoke-tested locally in tests/test_submit.py via a real spark-submit
subprocess.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "batch3dfier_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "batch3dfier_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
