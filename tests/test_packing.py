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


def test_emit_sequences_hand_checked(spark):
    """The writer really cuts every n_ctx tokens: distinct per-token
    words let us check the exact text of each sequence."""
    from batch3dfier_spark.operators.packing import emit_sequences

    # one shard; docs of 3, 4, 5 tokens; n_ctx=4 -> cuts at 4 and 8
    toks = [f"t{i}" for i in range(12)]
    pdf = pd.DataFrame({
        "doc_id": [0, 8, 16],
        "text": [" ".join(toks[0:3]), " ".join(toks[3:7]),
                 " ".join(toks[7:12])],
    })
    out = (
        emit_sequences(spark.createDataFrame(pdf), n_ctx=4, n_shards=8)
        .toPandas().sort_values("seq_id").reset_index(drop=True)
    )
    assert list(out["shard"]) == [0, 0, 0]
    assert list(out["seq_text"]) == [
        "t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9 t10 t11",
    ]
    assert list(out["n_tokens"]) == [4, 4, 4]


def test_emit_agrees_with_layout(spark):
    """Writer and layout are two views of one packing: every doc's
    (seq_id, seq_off) from pack_sequences points at the exact position
    of its first token in the emitted sequence text."""
    from batch3dfier_spark.operators.packing import (
        emit_sequences,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    layout = pack_sequences(docs, n_ctx=64, n_shards=4).toPandas()
    emitted = (
        emit_sequences(docs, n_ctx=64, n_shards=4)
        .toPandas().set_index(["shard", "seq_id"])
    )
    texts = docs.toPandas().set_index("doc_id")["text"].to_dict()
    checked = 0
    for row in layout.itertuples():
        first_tok = texts[row.doc_id].strip().split()[0]
        seq_toks = emitted.loc[(row.shard, row.seq_id), "seq_text"].split(" ")
        assert seq_toks[row.seq_off] == first_tok
        checked += 1
    assert checked == len(layout) > 0


def test_emit_sequences_matches_duckdb(spark):
    from batch3dfier_spark.plans.queries import REGISTRY

    fn, sql = REGISTRY["pack_emit"]
    got = fn(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    key = ["shard", "seq_id"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        exp[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    # every full sequence holds exactly n_ctx tokens
    full = got.groupby("shard")["seq_id"].transform("max") > got["seq_id"]
    assert (got.loc[full, "n_tokens"] == 512).all()


def test_pack_sequences_custom_token_counts(spark):
    """Round-5 verdict #7: a caller-supplied precomputed token count
    (the BPE path) drives the layout instead of the whitespace count —
    and n_shards=None derives the shard count from the sizing rule
    ceil(total_tokens / tokens_per_shard)."""
    from batch3dfier_spark.operators.packing import pack_sequences

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b", "c d e", "f", "g h"],          # whitespace: 2,3,1,2
        "bpe_tokens": [500, 10, 512, 100],              # tokenizer truth
    })
    out = (
        pack_sequences(
            spark.createDataFrame(pdf), n_ctx=512, n_shards=1,
            n_tokens_col="bpe_tokens",
        )
        .toPandas().set_index("doc_id").sort_index()
    )
    assert list(out["n_tokens"]) == [500, 10, 512, 100]
    # cum_before: 0, 500, 510, 1022
    assert list(out["seq_id"]) == [0, 0, 0, 1]
    assert list(out["seq_off"]) == [0, 500, 510, 510]
    assert list(out["spans"]) == [False, False, True, True]

    # n_shards=None: total 1122 tokens / 400 per shard -> 3 shards
    derived = (
        pack_sequences(
            spark.createDataFrame(pdf), n_ctx=512, n_shards=None,
            n_tokens_col="bpe_tokens", tokens_per_shard=400,
        )
        .toPandas()
    )
    assert sorted(derived["shard"].unique()) == [0, 1, 2]


def test_emit_sequences_custom_tokens_col(spark):
    """emit_sequences(tokens_col=...) packs the supplied token arrays
    and agrees with pack_sequences(n_tokens_col=size(tokens))."""
    from batch3dfier_spark.operators.packing import emit_sequences

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "toks": [["10", "11", "12"], ["20"], ["30", "31", "32", "33"]],
    })
    out = (
        emit_sequences(
            spark.createDataFrame(pdf), n_ctx=4, n_shards=1,
            tokens_col="toks",
        )
        .toPandas().sort_values(["shard", "seq_id"]).reset_index(drop=True)
    )
    assert list(out["seq_text"]) == ["10 11 12 20", "30 31 32 33"]
    assert list(out["n_tokens"]) == [4, 4]


def test_pack_sequences_driven_by_pretok_counts(spark):
    """End-to-end tokenizer-faithful packing: pretok_count supplies
    n_tokens_col, so the layout budget is measured in BPE-style
    pre-tokens instead of whitespace words — no document's pre-token
    count exceeds its sequence budget."""
    import pyspark.sql.functions as F

    from batch3dfier_spark.operators.packing import pack_sequences
    from batch3dfier_spark.operators.textstats import pretok_count

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("n_pretok", pretok_count(F.col("text")))
        .where(F.col("n_pretok") > 0)
    )
    out = pack_sequences(
        docs, n_ctx=256, n_shards=4, n_tokens_col="n_pretok"
    ).toPandas()
    assert len(out) == docs.count()
    # the layout's token accounting is the pretok law, verbatim
    got = out.set_index("doc_id")["n_tokens"].to_dict()
    exp = {r["doc_id"]: r["n_pretok"] for r in docs.collect()}
    assert got == exp
