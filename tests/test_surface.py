"""API-surface pins: ORC roundtrip, set operations, and the
grouped-agg pandas UDF (UDAF) class."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_is_exact(spark):
    from batch3dfier_spark.plans.queries import q_orc_roundtrip

    got = (q_orc_roundtrip(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (spark.read.parquet(f"{SF}/documents.parquet").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_orc_scan_pushes_filters(spark):
    from batch3dfier_spark.plans.queries import q_orc_roundtrip

    df = q_orc_roundtrip(spark, SF).where(F.col("doc_id") == 7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan


def test_set_ops_partition_users(spark):
    from batch3dfier_spark.plans.queries import q_set_ops

    got = q_set_ops(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    purch = set(ev[ev.event_type == "purchase"].user_id)
    err = set(ev[ev.event_type == "error"].user_id)
    both = set(got[got.tag == "both"].user_id)
    only = set(got[got.tag == "only_purchase"].user_id)
    assert both == purch & err
    assert only == purch - err
    assert both.isdisjoint(only)
    # distinct semantics: no duplicate (tag, user) rows
    assert not got.duplicated().any()


def test_grouped_agg_pandas_udaf_matches_builtin(spark):
    """The UDAF surface: a grouped-agg pandas UDF aggregates whole
    group series Arrow-side; its result must equal the JVM built-in
    for the same aggregate."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = (ev.groupBy("event_type")
           .agg(F.round(mean_udaf("value"), 6).alias("m"))
           .toPandas().set_index("event_type").sort_index())
    exp = (ev.groupBy("event_type")
           .agg(F.round(F.avg("value"), 6).alias("m"))
           .toPandas().set_index("event_type").sort_index())
    pd.testing.assert_frame_equal(got, exp)
