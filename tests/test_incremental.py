"""Incremental corpus dedup: admit-only-new semantics across
increments, corpus-shuffle-free anti-join on the bucketed state, and
the contract query vs its ANSI oracle."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

TABLE = "inc_corpus_test"


@pytest.fixture()
def corpus_table(spark):
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_increment_admits_only_new(spark, corpus_table):
    from batch3dfier_spark.operators.incremental import (
        append_increment,
        dedup_increment,
        register_corpus,
    )

    register_corpus(
        spark, _df(spark, [(1, "alpha"), (2, "beta")]), corpus_table,
        n_buckets=4,
    )
    batch = _df(spark, [
        (10, "alpha"),   # already in corpus
        (11, "gamma"),   # new
        (12, "gamma"),   # intra-batch dup of 11 -> min id keeps
        (13, "delta"),   # new
    ])
    admitted = dedup_increment(spark, batch, corpus_table)
    got = admitted.toPandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [11, 13]
    assert set(got.columns) == {"doc_id", "text", "text_sha"}

    # fold in, then replay the same batch: nothing is new anymore
    append_increment(spark, admitted, corpus_table, n_buckets=4)
    again = dedup_increment(spark, batch, corpus_table)
    assert again.count() == 0
    # a later batch only collides with what was actually admitted
    nxt = dedup_increment(
        spark, _df(spark, [(20, "gamma"), (21, "epsilon")]), corpus_table
    )
    assert list(nxt.toPandas()["doc_id"]) == [21]


def test_corpus_side_never_shuffles(spark, corpus_table):
    """The whole point of the bucketed state: per-increment network is
    O(|batch|).  The anti-join plan must shuffle ONLY the probe side —
    exactly one hash Exchange, and a bucketed corpus scan."""
    from batch3dfier_spark.operators.incremental import register_corpus

    register_corpus(
        spark,
        _df(spark, [(i, f"doc {i}") for i in range(100)]),
        corpus_table,
        n_buckets=4,
    )
    probe = _df(spark, [(1000 + i, f"probe {i}") for i in range(10)]).select(
        F.sha2("text", 256).alias("text_sha")
    )
    joined = probe.join(
        spark.table(corpus_table).select("text_sha").hint("merge"),
        "text_sha",
        "left_anti",
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    # exactly one hash Exchange: the probe side, repartitioned to the
    # bucket count; the corpus scan feeds the sort-merge join directly
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert joined.count() == 10


def test_contract_query_matches_oracle(spark):
    from batch3dfier_spark.plans.queries import REGISTRY

    fn, sql = REGISTRY["dedup_incremental"]
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
    # the increment admits some rows and rejects others
    n_batch = con.sql(
        "SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 0"
    ).fetchone()[0]
    assert 0 < len(got) < n_batch


def test_vocab_topk_matches_oracle(spark):
    """(Placed here to avoid another Spark-session module.)  vocab_topk
    == its DuckDB twin including boundary tie order."""
    from batch3dfier_spark.plans.queries import REGISTRY

    fn, sql = REGISTRY["vocab_topk"]
    got = fn(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(sql).df()
    # the sf0.001 fixture vocabulary is smaller than k; the whole
    # (deterministically ordered) vocabulary comes back
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got.sort_values("rank").reset_index(drop=True),
        exp.sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )
    # frequencies are non-increasing with rank
    assert (got.sort_values("rank")["freq"].diff().dropna() <= 0).all()


NTABLE = "ninc_corpus_test"


@pytest.fixture()
def near_corpus_table(spark):
    yield NTABLE
    spark.sql(f"DROP TABLE IF EXISTS {NTABLE}_sigs")
    spark.sql(f"DROP TABLE IF EXISTS {NTABLE}_bands")


def test_near_increment_semantics(spark, near_corpus_table):
    """Near-dup admission: exact copies and near-copies of corpus docs
    are rejected, intra-batch near-pairs keep the min id, genuinely
    new docs are admitted; folding the increment in makes a replay
    admit nothing."""
    from batch3dfier_spark.operators.incremental import (
        append_minhash_increment,
        near_dedup_increment,
        register_minhash_corpus,
    )

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the band plays on through the night")
    corpus = _df(spark, [
        (1, base),
        (2, "completely different corpus text about tile indexes and "
            "spatial joins running at scale"),
    ])
    register_minhash_corpus(spark, corpus, near_corpus_table, n_buckets=2)
    batch = _df(spark, [
        (10, base),                      # exact copy of corpus doc 1
        (11, base.replace("lazy", "sleepy")),  # near-copy of corpus doc 1
        (12, "a wholly novel document mentioning embeddings quantization "
             "and deterministic sampling thresholds"),
        (13, "a wholly novel document mentioning embeddings quantization "
             "and deterministic sampling thresholds!!"),  # near-copy of 12
        (14, "unique short text with no relatives anywhere in sight "
             "padded to shingle length comfortably"),
    ])
    admitted = near_dedup_increment(spark, batch, near_corpus_table)
    got = admitted.toPandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [12, 14]

    append_minhash_increment(spark, admitted, near_corpus_table,
                             n_buckets=2)
    again = near_dedup_increment(spark, batch, near_corpus_table)
    assert again.count() == 0


def test_near_increment_state_side_never_shuffles(spark, near_corpus_table):
    """Both state joins (band probe, signature fetch) must read the
    bucketed tables without an Exchange above the scans — per-increment
    network is O(|batch|)."""
    from batch3dfier_spark.operators.incremental import (
        near_dedup_increment,
        register_minhash_corpus,
    )

    register_minhash_corpus(
        spark,
        _df(spark, [(i, f"corpus document number {i} padded with words "
                        f"to clear the shingle minimum") for i in range(60)]),
        near_corpus_table, n_buckets=2,
    )
    # five probes with DISJOINT vocabularies: near-dup neither of the
    # corpus nor of each other (a shared template would trip the
    # intra-batch star rule and shrink the admitted count)
    probe_texts = [
        "glacier moraine erratic boulder till outwash esker drumlin kame",
        "sonata allegro cadenza arpeggio crescendo fugue ostinato motif",
        "isotope neutron capture decay gamma spectrum detector shielding",
        "estuary brackish mangrove tidal salinity sediment delta marsh",
        "ledger debit credit accrual amortization liability equity audit",
    ]
    batch = _df(spark, [(1000 + i, t) for i, t in enumerate(probe_texts)])
    out = near_dedup_increment(spark, batch, near_corpus_table)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Bucketed: true") >= 2, plan
    # no Exchange may sit directly above a bucketed state scan: every
    # Exchange in the plan partitions batch-derived rows only.  The
    # mechanical form: the plan's FileScans of the two state tables
    # appear, and the Exchange count equals the count with the state
    # subtrees removed -- approximated here by asserting the bucketed
    # scans report their bucket output (SortMergeJoin consumes them
    # sort-order-intact, which Spark only does Exchange-free).
    assert f"{NTABLE}_bands" in plan and f"{NTABLE}_sigs" in plan
    assert out.count() == 5


def test_near_increment_contract_matches_oracle(spark):
    from batch3dfier_spark.plans.queries import REGISTRY

    fn, sql = REGISTRY["near_dedup_incremental"]
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
    n_batch = con.sql(
        "SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 0"
    ).fetchone()[0]
    assert 0 < len(got) < n_batch
    spark.sql("DROP TABLE IF EXISTS b3d_ninc_contract_sigs")
    spark.sql("DROP TABLE IF EXISTS b3d_ninc_contract_bands")


def test_register_survives_stale_location(spark):
    """A leftover warehouse directory from a PREVIOUS session (fresh
    metastore, dirty warehouse) must not fail register_* with
    LOCATION_ALREADY_EXISTS — the round-6 driver red row."""
    import os

    from urllib.parse import urlparse

    from batch3dfier_spark.operators.incremental import (
        dedup_increment,
        near_dedup_increment,
        register_corpus,
        register_minhash_corpus,
    )

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("inc_stale_t", "ninc_stale_t_sigs", "ninc_stale_t_bands"):
        # simulate the stale dir: catalog has never seen the table but
        # its managed location already exists on disk
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(wh, t)
        os.makedirs(loc, exist_ok=True)
        with open(os.path.join(loc, "junk"), "w") as f:
            f.write("stale")

    try:
        register_corpus(
            spark, _df(spark, [(1, "alpha"), (2, "beta")]),
            "inc_stale_t", n_buckets=4,
        )
        got = dedup_increment(
            spark, _df(spark, [(10, "alpha"), (11, "new")]), "inc_stale_t"
        )
        assert list(got.toPandas()["doc_id"]) == [11]

        register_minhash_corpus(
            spark,
            _df(spark, [(1, "the quick brown fox jumps over the dog"),
                        (2, "a completely different sentence here")]),
            "ninc_stale_t", n_buckets=2,
        )
        out = near_dedup_increment(
            spark,
            _df(spark, [(10, "the quick brown fox jumps over the dog"),
                        (11, "unrelated fresh text with novel words")]),
            "ninc_stale_t",
        )
        assert list(out.toPandas()["doc_id"]) == [11]
    finally:
        for t in ("inc_stale_t", "ninc_stale_t_sigs", "ninc_stale_t_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
