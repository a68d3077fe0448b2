"""Neighbor resolution: interval-overlap joins + grid-partitioned kNN.

- J2 (config.py:202-259): for each footprint tile, every asset
  (point-cloud) tile whose rectangle st_intersects it.  Both indexes
  are small (<=1e6 rows); this is a broadcast range/interval join,
  precomputed once into a `tile_neighbors(ftpr_gid, asset_gid)` frame
  exactly like the reference resolves pc tiles per footprint tile.
- J3 (config.py:215-216): extent polygon vs asset index == select_tiles
  against the asset index.
- kNN (new capability, per north_rule): k nearest tiles for each
  feature point (point-to-rectangle distance), used to resolve
  neighbor tiles for boundary features.  Runs as a broadcast STRtree/
  distance probe inside an Arrow-batched mapInPandas: for each point,
  search expanding cell rings until k rects are found, then exact
  top-k by distance.  No shuffle: the tile index is broadcast; the
  point side streams.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import point_rect_distance, rects_overlap_pairs
from .tiler import TileIndex

__all__ = ["tile_neighbor_pairs", "tile_neighbors_spark", "knn_tiles"]


def tile_neighbor_pairs(a: TileIndex, b: TileIndex) -> pd.DataFrame:
    """Driver-side interval-overlap join of two small indexes (closed
    bounds — PostGIS st_intersects counts shared edges; see the
    reference golden: footprint tile 25gn1_c1 -> [25gn1_a, 25gn1_b],
    tests/test_config.py:78-95).  Uses the STRtree of `b` per `a` rect
    when `b` is large; dense pairs otherwise."""
    if len(b.frame) > 256:
        rows = []
        for i, r in enumerate(a.rects):
            hits = b.tree.query_rect(r[0], r[1], r[2], r[3])
            rows.extend((i, j) for j in hits)
        ai = np.array([r[0] for r in rows], dtype=np.int64)
        bi = np.array([r[1] for r in rows], dtype=np.int64)
    else:
        ai, bi = rects_overlap_pairs(a.rects, b.rects)
    return pd.DataFrame(
        {
            "ftpr_gid": a.frame["gid"].to_numpy()[ai],
            "ftpr_unit": a.frame["unit"].to_numpy()[ai],
            "asset_gid": b.frame["gid"].to_numpy()[bi],
            "asset_unit": b.frame["unit"].to_numpy()[bi],
        }
    )


def tile_neighbors_spark(df_a: DataFrame, df_b: DataFrame) -> DataFrame:
    """The same interval join as a Spark broadcast range join, for when
    the footprint index itself is a DataFrame (1e6-tile scale): each
    side keeps (gid, unit, xmin..ymax); the small side is broadcast and
    the overlap predicate stays inside codegen."""
    b = F.broadcast(df_b.select(
        F.col("gid").alias("asset_gid"),
        F.col("unit").alias("asset_unit"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"),
    ))
    a = df_a.select(
        F.col("gid").alias("ftpr_gid"),
        F.col("unit").alias("ftpr_unit"),
        "xmin", "ymin", "xmax", "ymax",
    )
    cond = (
        (a.xmin <= b.bxmax) & (b.bxmin <= a.xmax)
        & (a.ymin <= b.bymax) & (b.bymin <= a.ymax)
    )
    return a.join(b, cond, "inner").select(
        "ftpr_gid", "ftpr_unit", "asset_gid", "asset_unit"
    )


def knn_tiles(
    df: DataFrame,
    index: TileIndex,
    k: int = 3,
    x: str = "x",
    y: str = "y",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """k nearest tiles per feature point by point-to-rectangle distance
    (ties broken by gid, deterministic).  Output: keep-cols + x, y,
    nn_rank (1-based), nn_gid, nn_unit, nn_dist.

    Implementation: the tile index (packed rect bounds) is broadcast;
    each Arrow batch computes distances vectorized.  For small indexes
    (<= 4096 tiles) the distance matrix is dense; for larger indexes a
    grid-ring search bounds candidates.  Either way: no shuffle.
    """
    spark = df.sparkSession
    rects = index.rects
    gids = index.frame["gid"].to_numpy()
    units = index.frame["unit"].to_numpy()
    bc = spark.sparkContext.broadcast((rects, gids, units))
    cols = [*keep, x, y]

    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    )

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields[c] for c in cols]
        + [
            StructField("nn_rank", IntegerType()),
            StructField("nn_gid", LongType()),
            StructField("nn_unit", StringType()),
            StructField("nn_dist", DoubleType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r, g, u = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            d = point_rect_distance(px, py, r)  # (n_pts, n_tiles)
            kk = min(k, d.shape[1])
            # top-k by (dist, gid): argsort once on a structured key
            # (lexsort over the k-smallest partition for efficiency)
            part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(px)), kk)
            cand = part.ravel()
            dist = d[rows, cand]
            order = np.lexsort((g[cand], dist, rows))
            rows, cand, dist = rows[order], cand[order], dist[order]
            out = pdf[cols].iloc[rows].reset_index(drop=True)
            out["nn_rank"] = np.tile(np.arange(1, kk + 1), len(px))
            out["nn_gid"] = g[cand].astype("int64")
            out["nn_unit"] = u[cand]
            out["nn_dist"] = dist
            yield out

    return df.select(*cols).mapInPandas(probe, schema=out_schema)
