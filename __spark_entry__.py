"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):   flagship pipeline on sf0.001 — geocode the documents
                table, assign every row to its tile (J1 grid fast path,
                half-open exactly-one rule), roll up per-tile counts +
                percentile heights (A1/A3 analogs).
queries():      one entry per implemented operator from SURVEY.md §2,
                run by the engine's own operators.
oracle_sql():   exact DuckDB twins (see batch3dfier_spark/plans/queries.py
                for the cross-engine determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from batch3dfier_spark.plans import queries as Q

    return Q.q_heights_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from batch3dfier_spark.plans import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from batch3dfier_spark.plans import queries as Q

    return Q.oracle_sql()
