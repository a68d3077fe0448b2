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
    "register_minhash_corpus",
    "near_dedup_increment",
    "append_minhash_increment",
]


def _hashed(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha")
    )


def _reset_table(spark: SparkSession, table: str) -> None:
    """Make ``mode("overwrite").saveAsTable(table)`` idempotent under ANY
    session/warehouse combination.  ``overwrite`` can only replace a table
    the *current* catalog knows about; a leftover location directory from a
    previous session (fresh metastore, dirty warehouse cwd) fails CREATE
    with LOCATION_ALREADY_EXISTS.  So: drop the catalog entry if present,
    then remove a stale location directory the catalog does not own."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "") or ""
    parsed = urlparse(wh)
    if parsed.scheme not in ("", "file"):  # non-local warehouse: catalog
        return  # drop above is all we can (and need to) do locally
    root = parsed.path or wh
    parts = table.split(".")
    name = parts[-1].lower()
    candidates = [os.path.join(root, name)]
    if len(parts) > 1:  # db-qualified: <warehouse>/<db>.db/<table>
        candidates.insert(0, os.path.join(root, parts[-2].lower() + ".db", name))
    for loc in candidates:
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)


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
    _reset_table(spark, table)
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


# ---------------------------------------------------------------------------
# incremental NEAR-dup: a minhash-LSH corpus state, O(batch) per increment
# ---------------------------------------------------------------------------

def _est_matches(a, b, num_perm: int):
    """Matching-component count of two minhash signatures as a pure JVM
    expression (num_perm CASE terms — no HOF lambda, no Python):
    est_jaccard = matches / num_perm.  Kept for small screens; the hot
    candidate screens use _est_matches_vec — the chained element_at
    terms evaluate at only ~80k rows/s (46 s over the 3.8M-candidate
    screen at the 50k-doc bench scale, measured round 7)."""
    terms = None
    for i in range(num_perm):
        t = F.when(
            F.element_at(a, i + 1) == F.element_at(b, i + 1), 1
        ).otherwise(0)
        terms = t if terms is None else terms + t
    return terms


def _est_matches_vec():
    """Arrow-vectorized matching-component count (guide §4: one numpy
    comparison over stacked signature batches instead of num_perm
    per-row element_at expressions — ~25x per-row throughput on the
    candidate screens, bit-identical counts)."""
    import numpy as np
    import pandas as pd

    def _fn(a, b):
        if len(a) == 0:
            return pd.Series(np.array([], dtype=np.int32))
        A = np.stack(a.to_numpy())
        B = np.stack(b.to_numpy())
        return pd.Series((A == B).sum(axis=1).astype(np.int32))

    return F.pandas_udf(_fn, "int")


def register_minhash_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    n_buckets: int = 8,
    bucket_cap: int = 128,
) -> None:
    """Materialize the corpus NEAR-dup state — the minhash analog of
    register_corpus's exact-hash state, sized for a forever-growing
    100 TB corpus:

    - `{table}_sigs` (id, signature[num_perm]): num_perm*8 bytes per
      doc (the whole reason decisions run on signature ESTIMATES —
      storing shingle sets for exact verification would be a second
      copy of the corpus), bucketed+sorted by id so the per-candidate
      signature fetch never shuffles the corpus side;
    - `{table}_bands` (band_id, band_hash, id): the LSH postings,
      bucketed+sorted by (band_id, band_hash) so a batch's band probe
      is a bucket-local sort-merge join — O(|batch|) network per
      increment.  Each (band_id, band_hash) bucket keeps only its
      `bucket_cap` lowest ids (deterministic, QUALIFY-reproducible):
      a mega-cluster of near-identical corpus docs needs only a few
      stored representatives to reject every future member, and the
      cap bounds any later probe's fan-out.

    Signatures are computed ONCE (the Arrow pass is the expensive
    part): sigs are written first and the band postings derive from
    reading them back."""
    from .dedup import band_rows, minhash_signatures

    _reset_table(spark, table + "_sigs")
    _reset_table(spark, table + "_bands")
    sigs = minhash_signatures(
        corpus, text_col=text_col, id_col=id_col,
        num_perm=num_perm, shingle_k=shingle_k,
    )
    (
        sigs.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, id_col).sortBy(id_col)
        .saveAsTable(table + "_sigs")
    )
    banded = band_rows(spark.table(table + "_sigs"), id_col, bands)
    if bucket_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_id", "band_hash").orderBy(id_col)
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    (
        banded.select("band_id", "band_hash", id_col)
        .write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "band_id", "band_hash")
        .sortBy("band_id", "band_hash")
        .saveAsTable(table + "_bands")
    )


def near_dedup_increment(
    spark: SparkSession,
    batch: DataFrame,
    table: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    bucket_cap: int = 128,
) -> DataFrame:
    """Admit the rows of `batch` that are near-new: estimated jaccard
    (matching minhash components / num_perm) below `threshold` against
    every stored corpus doc AND against every earlier batch doc (the
    lowest id of an intra-batch near-pair survives, the star rule).
    Returns the admitted batch rows.

    This is the daily-crawl steady state for NEAR duplication, and the
    decision is deliberately estimate-based: the corpus state stores
    signatures only (see register_minhash_corpus), which is what makes
    an ever-growing corpus state affordable — the batch side, being
    small, could verify exactly, but cross-engine the rule must be one
    rule, so both sides use the ceil(num_perm * threshold) component
    screen (at num_perm=64 the estimate's std-dev at the 0.5 boundary
    is ~0.06; production LSH dedup runs on exactly this trade).

    Scale shape: both joins against state hint MERGE and land on the
    state's bucket layout — band probe on (band_id, band_hash),
    signature fetch on the candidate ids — so ONLY batch-derived rows
    ever shuffle; the corpus side is Exchange-free (asserted in
    tests/test_incremental.py)."""
    import math

    from .dedup import band_rows, lsh_candidates, minhash_signatures

    k_min = int(math.ceil(num_perm * threshold))
    bsigs = minhash_signatures(
        batch, text_col=text_col, id_col=id_col,
        num_perm=num_perm, shingle_k=shingle_k,
    ).persist()
    bbands = band_rows(bsigs, id_col, bands)

    # corpus collisions: band probe -> candidate (batch, corpus) pairs
    # -> signature screen.  distinct() before the sig fetch: a pair
    # colliding in several bands is one candidate.
    hits = (
        bbands.join(
            spark.table(table + "_bands")
            .withColumnRenamed(id_col, "_cid").hint("merge"),
            ["band_id", "band_hash"],
        )
        .select(id_col, "_cid")
        .distinct()
    )
    csigs = (
        spark.table(table + "_sigs")
        .select(F.col(id_col).alias("_cid"),
                F.col("signature").alias("_csig"))
        .hint("merge")
    )
    cand = (
        hits.join(csigs, "_cid")
        .join(
            F.broadcast(bsigs.select(
                F.col(id_col), F.col("signature").alias("_bsig"))),
            id_col,
        )
    )
    est = _est_matches_vec()
    corpus_dups = (
        cand.where(est(F.col("_bsig"), F.col("_csig")) >= F.lit(k_min))
        .select(id_col)
        .distinct()
    )

    # intra-batch: LSH candidates within the batch, same screen, the
    # higher id of each near-pair drops (min-id star rule)
    pairs = lsh_candidates(bsigs, id_col=id_col, bands=bands,
                           bucket_cap=bucket_cap)
    sa = F.broadcast(bsigs.select(F.col(id_col).alias("id_a"),
                                  F.col("signature").alias("_sa")))
    sb = F.broadcast(bsigs.select(F.col(id_col).alias("id_b"),
                                  F.col("signature").alias("_sb")))
    intra_dups = (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .where(est(F.col("_sa"), F.col("_sb")) >= F.lit(k_min))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )

    dropped = corpus_dups.unionByName(intra_dups).distinct()
    return batch.join(dropped, id_col, "left_anti")


def append_minhash_increment(
    spark: SparkSession,
    admitted: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    n_buckets: int = 8,
) -> None:
    """Fold an admitted increment into the near-dup state, preserving
    both bucket specs so every later probe stays corpus-shuffle-free.
    The per-bucket posting cap is enforced at register time and by
    periodic compaction, not on append — an increment's postings are
    O(|batch|) and re-capping would read state back."""
    from .dedup import band_rows, minhash_signatures

    sigs = minhash_signatures(
        admitted, text_col=text_col, id_col=id_col,
        num_perm=num_perm, shingle_k=shingle_k,
    ).persist()
    (
        sigs.write.mode("append").format("parquet")
        .bucketBy(n_buckets, id_col).sortBy(id_col)
        .saveAsTable(table + "_sigs")
    )
    (
        band_rows(sigs, id_col, bands)
        .select("band_id", "band_hash", id_col)
        .write.mode("append").format("parquet")
        .bucketBy(n_buckets, "band_id", "band_hash")
        .sortBy("band_id", "band_hash")
        .saveAsTable(table + "_bands")
    )
    sigs.unpersist()
