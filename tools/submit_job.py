"""spark-submit driver script (the cluster entry point).

The package arrives via --py-files; this script only parses argv and
delegates to batch3dfier_spark.app. Usage:

    spark-submit --py-files dist/batch3dfier_spark.zip \
        tools/submit_job.py run job.yml
"""

from __future__ import annotations

import sys

from batch3dfier_spark.app import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
