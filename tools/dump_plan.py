"""Dump .explain("formatted") of named contract queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [query ...]
       python tools/dump_plan.py plans/r07 before bm25_topk hybrid_rrf
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from batch3dfier_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="dump-plan", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry.queries()
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
