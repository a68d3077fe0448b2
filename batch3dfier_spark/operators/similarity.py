"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline.  The query set is
  broadcast; scoring is a JVM higher-order-function expression
  (zip_with + aggregate over doubles — whole-stage codegen, no Python);
  top-k is a ranking window partitioned by query id.
- LSH-bucketed ANN (the scale path): deterministic random-hyperplane
  signs from a fixed-seed projection matrix; candidates = same bucket
  in >=1 of `tables` hash tables; exact re-scoring only within buckets.
  At 100 TB the bucket join replaces the O(N*Q) cross product with a
  shuffle on (table, bucket) keys.

Determinism: similarities are computed on float->double-cast values and
rounded before ranking; ties broken by vec_id — so results are stable
across partitionings and match the SQL oracle exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_topk",
    "lsh_ann_topk",
    "hyperplane_signatures",
    "ivf_build",
    "ivf_topk",
    "ivf_seed_centroids",
    "ivf_topk_frozen",
]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (self-pairs
    excluded).  queries is expected to be small -> broadcast cross join;
    all arithmetic in doubles, JVM-side."""
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cand_vec"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("query_vec"),
        )
    )
    scored = (
        cand.crossJoin(q)
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("query_vec"), F.col("cand_vec"))
                / (_norm(F.col("query_vec")) * _norm(F.col("cand_vec"))),
                round_to,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


from .dedup import QUANT  # single source of the 2^20 cross-engine quantum

# splitmix64 finalizer constants (closed form shared with the SQL oracle)
_SM_C0 = 0x9E3779B97F4A7C15
_SM_K1 = 0xBF58476D1CE4E5B9
_SM_K2 = 0x94D049BB133111EB


def _projection(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic integer hyperplane weights from the splitmix64
    finalizer over the counter d*2^20 + c — a closed form an ANSI-SQL
    oracle can recompute exactly (DuckDB: HUGEINT arithmetic with
    staged mod-2^64 multiplies), unlike a seeded Mersenne-Twister
    gaussian.  w[d, c] = mix(d, c) >> 44 - 2^19, uniform over
    [-2^19, 2^19) — integer-valued in float64, so quantized-vector dot
    products are exact and sign tests are bit-identical across engines.

    History: a weaker two-round LCG stood here through round 2.  Its
    flaw: for fixed d, consecutive planes differed by the CONSTANT
    B*M mod 2^32, i.e. every plane was the previous plane plus a fixed
    offset vector — near-parallel hash tables (measured mean |corr|
    0.37, max 1.0 between normalized planes!), which silently destroyed
    LSH pruning (~0.9 of all pairs became candidates) and capped
    recall.  splitmix64 measures mean |corr| 0.10 — the random-gaussian
    expectation sqrt(2/(pi*dim)) — and restores the collision math the
    docstrings advertise."""
    d = np.arange(dim, dtype=np.uint64)[:, None]
    c = np.arange(n_planes, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):  # uint64 wrap == mod 2^64
        z = d * np.uint64(1 << 20) + c + np.uint64(_SM_C0)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_SM_K1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM_K2)
        z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(44)).astype(np.float64) - 524288.0


def _quantize_half_away(V: np.ndarray) -> np.ndarray:
    """round(x * 2^20) half-away-from-zero — matches Spark F.round
    (HALF_UP) and DuckDB ROUND; np.round is half-even and diverges."""
    raw = V * QUANT
    return np.sign(raw) * np.floor(np.abs(raw) + 0.5)


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_id, bucket) random-hyperplane LSH buckets — one row
    per hash table.  Signs computed in one Arrow-batched numpy matmul
    per batch; vectors and weights are both integer-quantized so every
    dot product is exact in float64 (64 dims x 2^20 x 2^20 < 2^53) and
    the bucket assignment is reproducible bit-for-bit by the SQL
    oracle regardless of accumulation order."""
    proj = _projection(dim, n_planes * tables)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(proj)

    def buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bc.value
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _quantize_half_away(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            signs = (V @ P) > 0  # (n, planes*tables), exact int dots
            out = []
            for t in range(tables):
                block = signs[:, t * n_planes : (t + 1) * n_planes]
                bucket = (block.astype(np.int64) * weights).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].to_numpy(),
                            "table_id": t,
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(
        buckets, schema=f"{id_col} bigint, table_id int, bucket bigint"
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    tables: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query
    in any table; exact cosine re-scoring on candidates only.

    Parameter intuition: a pair at angle theta collides in one table
    with prob (1 - theta/pi)^n_planes; recall ~= 1-(1-p)^tables.  The
    defaults (6 planes x 24 tables) give ~0.97 recall at cosine 0.5
    while still pruning ~98% of the corpus per table at 64 dims."""
    cand_sig = hyperplane_signatures(
        embeddings, dim, n_planes, tables, id_col, vec_col
    ).withColumnRenamed(id_col, "cand_id")
    q_sig = hyperplane_signatures(
        queries, dim, n_planes, tables, id_col, vec_col
    ).withColumnRenamed(id_col, "query_id")
    pairs = (
        cand_sig.join(F.broadcast(q_sig), ["table_id", "bucket"])
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cand_vec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("query_vec"),
    )
    scored = (
        pairs.join(cand, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("query_vec"), F.col("cand_vec"))
                / (_norm(F.col("query_vec")) * _norm(F.col("cand_vec"))),
                6,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared ranking tail: top-k per query by (cosine desc, cand_id)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "cand_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH
# ---------------------------------------------------------------------------

def _assign_centroids(df: DataFrame, centroids: np.ndarray,
                      id_col: str, vec_col: str,
                      quantize: bool = False) -> DataFrame:
    """(id, cid) — nearest centroid per vector by squared L2, ties by
    centroid id (argmin returns the first).  One Arrow-batched matmul
    per batch against the broadcast centroid matrix.

    quantize=True rounds vectors to the 2^20 integer grid first (the
    centroids must already be quantized): every -2 v.c + ||c||^2 term is
    then an exact integer in float64, so the argmin is bit-reproducible
    by a HUGEINT SQL oracle regardless of accumulation order."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        c_sq = (C * C).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if quantize:
                V = _quantize_half_away(V)
            # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 constant
            # per row, so argmin over (-2 v.c + ||c||^2) suffices
            d = -2.0 * (V @ C.T) + c_sq[None, :]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cid": d.argmin(axis=1).astype("int32")}
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} bigint, cid int"
    )


def _probe_centroids(queries: DataFrame, centroids: np.ndarray,
                     nprobe: int, id_col: str, vec_col: str,
                     quantize: bool = False) -> DataFrame:
    """(query_id, cid) — each query's `nprobe` nearest centroids by the
    same exact metric/tie rule as _assign_centroids.  Runs as a
    mapInPandas over the query DataFrame against the broadcast centroid
    matrix — NO driver collect, so a large query set streams through
    executors like any other stage."""
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        c_sq = (C * C).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if quantize:
                V = _quantize_half_away(V)
            d = -2.0 * (V @ C.T) + c_sq[None, :]
            near = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[id_col].to_numpy(), nprobe),
                    "cid": near.ravel().astype("int32"),
                }
            )

    return queries.select(id_col, vec_col).mapInPandas(
        probe, schema="query_id bigint, cid int"
    )


def ivf_build(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, DataFrame]:
    """IVF coarse quantizer: k-means with DETERMINISTIC seeding (the
    n_centroids lowest-id vectors) and `iters` Lloyd rounds run as
    DataFrame jobs.  Returns (centroids, assignments DF (id, cid)).

    Scale shape: each round is one mapInPandas assignment pass (matmul
    against the broadcast centroid matrix) + one elementwise-mean agg.
    The mean runs as posexplode -> groupBy(cid, dim).avg — a shuffle of
    (n_vectors x dim) scalars — and only (n_centroids x dim) tiny rows
    come back to the driver.  Empty clusters keep their previous
    centroid.  Centroids are rounded to 1e-6 so the index is stable
    against float-sum ordering across cluster layouts."""
    seed = (
        embeddings.orderBy(F.col(id_col)).limit(n_centroids)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .toPandas()["v"]
    )
    C = np.stack(seed.to_numpy()).astype(np.float64)
    q = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    for _ in range(iters):
        assigned = _assign_centroids(q, C, id_col, "_v")
        means = (
            q.join(assigned, id_col)
            .select("cid", F.posexplode("_v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
            .toPandas()
        )
        C = C.copy()
        for cid, grp in means.groupby("cid"):
            C[int(cid)] = grp.sort_values("dim")["m"].to_numpy()
        C = np.round(C, 6)
    return C, _assign_centroids(q, C, id_col, "_v")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[np.ndarray, DataFrame] | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine: candidates = vectors assigned to
    each query's `nprobe` nearest centroids (inverted lists selected by
    an equi-join on cid — the classic IVF probe); exact cosine
    re-scoring + ranking window on candidates only.

    At 100 TB the assignments table is the durable index (write it
    bucketed by cid: probes become pruned scans); `nprobe/n_centroids`
    trades recall for the fraction of the corpus scanned — with the
    defaults each query scores ~nprobe/n_centroids = 12.5% of vectors,
    vs 100% for cosine_topk."""
    C, assigned = (
        index
        if index is not None
        else ivf_build(embeddings, dim, n_centroids, iters=3,
                       id_col=id_col, vec_col=vec_col)
    )
    q_dbl = queries.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    probes = _probe_centroids(q_dbl, C, nprobe, id_col, "_v")
    cand_ids = (
        assigned.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(probes), "cid")
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
    )
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cand_vec"),
    )
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("query_vec"),
        )
    )
    scored = (
        cand_ids.join(cand, "cand_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("query_vec"), F.col("cand_vec"))
                / (_norm(F.col("query_vec")) * _norm(F.col("cand_vec"))),
                6,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)


def ivf_seed_centroids(
    embeddings: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Frozen coarse quantizer: the `n_centroids` lowest-id vectors,
    quantized to the 2^20 integer grid (half-away rounding == Spark
    F.round == DuckDB ROUND).  No Lloyd rounds — deterministic and, with
    every distance term an exact integer, fully SQL-reproducible."""
    seed = (
        embeddings.orderBy(F.col(id_col)).limit(n_centroids)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .toPandas()["v"]
    )
    return _quantize_half_away(np.stack(seed.to_numpy()).astype(np.float64))


def ivf_topk_frozen(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Oracle-checkable IVF ANN: identical probe/score shape to
    `ivf_topk`, but the coarse quantizer is FROZEN at the quantized
    seed vectors (ivf_seed_centroids) instead of Lloyd-iterated means.

    Why this variant exists: k-means float averages are not
    bit-reproducible in ANSI SQL, so the Lloyd version can only be
    recall-gated in pytest.  Freezing the centroids makes every stage —
    assignment argmin, probe selection, candidate join, cosine
    re-score — exactly recomputable by the DuckDB HUGEINT oracle
    (integer-quantized distances; raw-double cosine identical in list
    order), giving IVF a full rows+schema+hash contract entry.  Recall
    is a few points below the Lloyd quantizer (seed cells are less
    balanced) at the same nprobe; scale shape is unchanged — the probe
    equi-join still scans ~nprobe/n_centroids of the corpus."""
    C = ivf_seed_centroids(embeddings, n_centroids, id_col, vec_col)
    q_dbl = queries.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    e_dbl = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    assigned = _assign_centroids(e_dbl, C, id_col, "_v", quantize=True)
    probes = _probe_centroids(q_dbl, C, nprobe, id_col, "_v", quantize=True)
    cand_ids = (
        assigned.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(probes), "cid")
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
    )
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cand_vec"),
    )
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("query_vec"),
        )
    )
    scored = (
        cand_ids.join(cand, "cand_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("query_vec"), F.col("cand_vec"))
                / (_norm(F.col("query_vec")) * _norm(F.col("cand_vec"))),
                6,
            ).alias("cosine"),
        )
    )
    return _rank_topk(scored, k)
