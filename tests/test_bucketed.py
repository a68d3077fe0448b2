"""Bucketed ingest: per-tile work must be shuffle-free on the stored
layout (the 100 TB steady-state design — pay one clustering shuffle at
ingest, never again)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch3dfier_spark import datagen
from batch3dfier_spark.operators.heights import join_heights, percentile_heights
from batch3dfier_spark.operators.tiler import TileIndex
from batch3dfier_spark.sources.pages import ingest_pages_bucketed


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("bucketed") / "pages"
    datagen.gen_pages_spark(spark, 5000, str(raw), partitions=4)
    idx = TileIndex.regular_grid(datagen.REF_TERRITORY, 8, 8)
    ingest_pages_bucketed(
        spark, str(raw), "pages_bucketed", idx, datagen.REF_TERRITORY,
        n_buckets=4,
    )
    yield "pages_bucketed"
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")


def test_groupby_on_bucket_column_has_no_exchange(spark, bucketed_table):
    plan = (
        spark.table(bucketed_table)
        .groupBy("tile_gid")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_rollup_join_back_has_no_exchange(spark, bucketed_table):
    feats = spark.table(bucketed_table).select(
        "url", "tile_gid", F.length("text").alias("z")
    )
    h = percentile_heights(
        feats, key="tile_gid", value="z",
        ground=[0.5], roof=[0.9], exact=False, round_to=None,
    )
    joined = join_heights(feats, h, key="tile_gid")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # BroadcastExchange of the tiny rollup is fine; what must never
    # appear is a shuffle of the fact table
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert joined.count() == spark.table(bucketed_table).count()


def test_bucketed_matches_plain_assignment(spark, bucketed_table):
    got = (
        spark.table(bucketed_table)
        .groupBy("tile_gid")
        .count()
        .orderBy("tile_gid")
        .toPandas()
    )
    assert int(got["count"].sum()) == 5000
    # exactly-one-tile invariant survives the bucketed write
    dup = (
        spark.table(bucketed_table)
        .groupBy("url")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_analyze_statistics_recorded(spark, bucketed_table):
    """D4 parity: ingest records table + tile_gid column statistics so
    the cost-based optimizer plans from real rowCounts, not file-size
    guesses."""
    desc = spark.sql(
        f"DESCRIBE EXTENDED {bucketed_table}"
    ).toPandas()
    stats = desc[desc["col_name"] == "Statistics"]["data_type"]
    assert len(stats) == 1 and "rows" in stats.iloc[0]
    cdesc = spark.sql(
        f"DESCRIBE EXTENDED {bucketed_table} tile_gid"
    ).toPandas().set_index("info_name")["info_value"]
    assert int(cdesc["distinct_count"]) > 0
    assert cdesc["min"] != "NULL" and cdesc["max"] != "NULL"
