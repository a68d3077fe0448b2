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

__all__ = ["cosine_topk", "lsh_ann_topk", "hyperplane_signatures"]


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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "cand_id", "cosine")
    )


def _projection(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(20240816)
    return rng.standard_normal((dim, n_planes))


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
    per batch."""
    proj = _projection(dim, n_planes * tables)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(proj)

    def buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bc.value
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (V @ P) > 0  # (n, planes*tables)
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "cand_id", "cosine")
    )
