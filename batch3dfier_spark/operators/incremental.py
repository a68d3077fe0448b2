"""Incremental corpus dedup: admit each incoming batch of documents
only where its content is new — against everything already accepted —
then fold the admitted hashes into the corpus state.  This is the
daily-crawl steady state of a training-data pipeline: the corpus is
~100 TB and grows forever; the batch is the small new increment.

Spark-first shape:
- corpus state is a BUCKETED catalog table of content hashes
  (`bucketBy(n_buckets, "text_sha")` — the same durable
  hash-partitioning the tile dispatch layout uses,
  sources/pages.py:60-99).  A batch-vs-corpus anti-join then shuffles
  ONLY the batch: the scan of the corpus side reports
  HashPartitioning(text_sha) and Catalyst drops its Exchange.  Without
  bucketing, every daily batch would re-shuffle the full corpus hash
  set — the difference between O(|batch|) and O(|corpus|) network per
  increment, which at 100 TB of corpus is the whole game.
- intra-batch dedup first (the batch may repeat itself): min-id keeper
  per hash, the same groupBy-min rule as exact_dedup — partial
  aggregation absorbs hot identical docs map-side.
- the admitted increment is APPENDED to the bucketed table with the
  identical bucket spec, so the no-corpus-shuffle property survives
  every increment (asserted in tests/test_incremental.py).

Determinism: sha2-256 of the raw text; survivor = min id; no
randomness, no timestamps.  `dedup_increment` itself is replayed by an
ANSI twin (`sql_dedup_increment`) over two derived views.

Reference analog: none directly (the reference re-runs whole tiles;
its resume bookkeeping `operators/dispatch.py` is the tile-level
cousin).  Part of the engine's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "register_corpus",
    "dedup_increment",
    "append_increment",
    "sql_dedup_increment",
]


def _hashed(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha")
    )


def register_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Materialize the corpus content-hash state as a bucketed catalog
    table (text_sha-bucketed, one row per distinct hash with its
    keeper id).  One shuffle now; zero corpus shuffles on every later
    increment."""
    (
        _hashed(corpus, text_col, id_col)
        .groupBy("text_sha")
        .agg(F.min(id_col).alias(id_col))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "text_sha")
        .sortBy("text_sha")
        .saveAsTable(table)
    )


def dedup_increment(
    spark: SparkSession,
    batch: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of `batch` that are new: not an intra-batch duplicate (min
    id per hash wins) and not already in the corpus table.  Returns the
    batch's columns plus text_sha; only the batch side shuffles."""
    h = _hashed(batch, text_col, id_col)
    keepers = h.groupBy("text_sha").agg(F.min(id_col).alias(id_col))
    # merge hint: the corpus side must NEVER be broadcast (it is the
    # 100 TB side; the optimizer only sees a cheap hash-column scan and
    # would happily broadcast a "small-looking" sample of it in tests
    # or misconfigured sessions).  Under sort-merge the bucketed scan
    # satisfies the join's distribution itself — no corpus Exchange.
    fresh = keepers.join(
        spark.table(table).select("text_sha").hint("merge"),
        "text_sha",
        "left_anti",
    )
    return batch.join(fresh, id_col, "inner")


def append_increment(
    spark: SparkSession,
    admitted: DataFrame,
    table: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Fold an admitted increment (output of dedup_increment) into the
    corpus state, preserving the bucket spec — the anti-join stays
    corpus-shuffle-free on every later batch."""
    (
        admitted.select("text_sha", F.col(id_col))
        .write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, "text_sha")
        .sortBy("text_sha")
        .saveAsTable(table)
    )


def sql_dedup_increment(
    batch_sql: str,
    corpus_sql: str,
    text: str = "text",
) -> str:
    """ANSI twin of dedup_increment over derived batch/corpus views:
    intra-batch min-id keeper, then anti-join against corpus hashes."""
    return f"""
WITH batch AS ({batch_sql}),
corpus AS ({corpus_sql}),
bh AS (SELECT doc_id, sha256({text}) AS text_sha FROM batch),
keepers AS (
  SELECT text_sha, MIN(doc_id) AS doc_id FROM bh GROUP BY text_sha
),
fresh AS (
  SELECT k.text_sha, k.doc_id FROM keepers k
  WHERE NOT EXISTS (
    SELECT 1 FROM corpus c WHERE sha256(c.{text}) = k.text_sha)
)
SELECT b.*, f.text_sha
FROM batch b JOIN fresh f USING (doc_id)
"""
