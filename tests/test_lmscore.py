"""CCNet-style LM scorer: oracle parity, cost-law semantics, edge
cases, broadcast-path equivalence, and plan-shape contracts."""

import duckdb
import pandas as pd

from batch3dfier_spark.operators.lmscore import (
    DEFAULT_LM_THRESHOLD, lm_score, lm_train, sql_lm_score)

SF = "/root/testdata/sf0.001"


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con.sql(sql).df()


def test_lm_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    got = (lm_score(docs, lm_train(docs))
           .select("doc_id", "lm_bits", "lm_mbits_tok", "lm_kept")
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    exp = _oracle(sql_lm_score()).sort_values(
        "doc_id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_rare_tokens_cost_more_bits(spark):
    # train: 'common' 7 times, 'rare' once -> N=8, V=2, smoothed
    # pool 10; cost(common)=bits(10//8)=1, cost(rare)=bits(10//2)=3,
    # cost(unseen)=bits(10//1)=4
    train = spark.createDataFrame(
        [(0, "common " * 7 + "rare")], "doc_id int, text string")
    vocab = lm_train(train)
    score = spark.createDataFrame(
        [(1, "common common"), (2, "rare"), (3, "unseen")],
        "doc_id int, text string")
    got = lm_score(score, vocab).toPandas().set_index("doc_id")
    assert int(got.loc[1, "lm_bits"]) == 2
    assert int(got.loc[2, "lm_bits"]) == 3
    assert int(got.loc[3, "lm_bits"]) == 4
    assert int(got.loc[1, "lm_mbits_tok"]) == 1000
    assert int(got.loc[3, "lm_mbits_tok"]) == 4000


def test_empty_and_null_docs_score_zero_and_drop(spark):
    train = spark.createDataFrame(
        [(0, "a b c")], "doc_id int, text string")
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id int, text string")
    got = lm_score(df, lm_train(train)).toPandas().set_index("doc_id")
    assert (got["lm_bits"] == 0).all()
    assert (got["lm_mbits_tok"] == 0).all()
    assert not got["lm_kept"].any()  # token-less docs are never kept


def test_broadcast_vocab_path_is_identical(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text").limit(100)
    vocab = lm_train(docs)
    a = (lm_score(docs, vocab, broadcast_vocab=False)
         .select("doc_id", "lm_bits").toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_score(docs, vocab, broadcast_vocab=True)
         .select("doc_id", "lm_bits").toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_plan_has_no_window_and_no_python(spark):
    # hot tokens meet joins and aggregates (AQE-splittable), never a
    # window; the whole operator stays JVM-side
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    plan = (lm_score(docs, lm_train(docs))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "Python" not in plan


def test_default_threshold_splits_the_fixture(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    pdf = lm_score(docs, lm_train(docs),
                   threshold_mbits=DEFAULT_LM_THRESHOLD).select(
        "lm_kept").toPandas()
    frac = pdf["lm_kept"].mean()
    assert 0.05 <= frac <= 0.95
