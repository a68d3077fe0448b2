"""Sequence packing: layout invariants, oracle parity, and partition
independence (the layout is a pure function of doc_id order + token
counts, never of physical partitioning)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pack_sequences_matches_duckdb(spark):
    from batch3dfier_spark.plans.queries import REGISTRY

    fn, sql = REGISTRY["pack_sequences"]
    got = fn(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("doc_id").reset_index(drop=True),
        exp[cols].sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    # the packing is non-trivial on the fixture: several sequences per
    # shard, and at least one doc spans a cut
    assert got.groupby("shard")["seq_id"].max().min() >= 1
    assert bool(got["spans"].any())


def test_pack_sequences_layout_invariants(spark):
    """Hand-checkable layout: 4 docs of 3/510/5/600 tokens in one
    shard with n_ctx=512 — offsets accumulate, cuts land where the
    running total crosses multiples of 512."""
    from batch3dfier_spark.operators.packing import pack_sequences

    def words(n):
        return " ".join(["w"] * n)

    pdf = pd.DataFrame({
        "doc_id": [0, 8, 16, 24],  # all % 8 == 0 -> one shard
        "text": [words(3), words(510), words(5), words(600)],
    })
    out = (
        pack_sequences(spark.createDataFrame(pdf), n_ctx=512, n_shards=8)
        .toPandas().set_index("doc_id")
    )
    assert (out["shard"] == 0).all()
    # cum_before: 0, 3, 513, 518
    assert list(out["seq_id"]) == [0, 0, 1, 1]
    assert list(out["seq_off"]) == [0, 3, 1, 6]
    # doc 8: 3+510=513 > 512 spans; doc 16: 1+5 fits; doc 24: 6+600 spans
    assert list(out["spans"]) == [False, True, False, True]


def test_pack_sequences_partition_independent(spark):
    from batch3dfier_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = (
        pack_sequences(docs.repartition(1), n_ctx=256, n_shards=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_sequences(docs.repartition(16), n_ctx=256, n_shards=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
