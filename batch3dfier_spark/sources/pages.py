"""Pages table ingest: the geocode-materialization pass.

The reference materializes building centroids as a dedicated table with
a GiST index because the tile-assignment join is run many times against
it (batch3dfier/footprints.py:93-150).  The 100 TB equivalent: one scan
over the raw pages that computes geocode (x, y) and tile assignment,
then writes a spatially CLUSTERED copy — `repartitionByRange(tile_gid)`
+ sort within partitions — so that

- every downstream query gets x/y/tile_gid as stored columns (no
  re-hashing), and
- parquet row-group min/max stats on x, y, tile_gid make extent/tile
  predicates prune at scan time (the partition-pruning analog of the
  reference's per-tile views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import Rect
from ..operators.tiler import TileIndex, assign_tiles, with_geocode

__all__ = [
    "ingest_pages",
    "read_geocoded",
    "ingest_pages_bucketed",
    "ingest_pages_cells",
    "read_pages_extent",
]


def ingest_pages(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    index: TileIndex,
    territory: Rect,
    n_buckets: int = 64,
) -> None:
    """One pass: raw pages -> geocode -> tile assign -> cluster by tile
    -> parquet.  `n_buckets` bounds output file count (range-partitioned
    by tile_gid, sorted within — Z-order-lite clustering)."""
    df = spark.read.parquet(in_path)
    a = assign_tiles(with_geocode(df, territory), index)
    (
        a.repartitionByRange(n_buckets, "tile_gid")
        .sortWithinPartitions("tile_gid")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def read_geocoded(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ingest_pages_bucketed(
    spark: SparkSession,
    in_path: str,
    table: str,
    index: TileIndex,
    territory: Rect,
    n_buckets: int = 64,
    analyze: bool = True,
) -> None:
    """Like ingest_pages, but writes a bucketed catalog table
    (bucketBy(tile_gid) + sortBy) — Spark's durable hash-partitioning
    metadata.  Every later groupBy('tile_gid') / self-join / rollup
    join-back over this table is SHUFFLE-FREE: the scan reports
    HashPartitioning(tile_gid) and Catalyst drops the Exchange
    (asserted in tests/test_bucketed.py).

    This is the 100 TB steady-state layout for per-tile dispatch —
    the analog of the reference keeping per-tile views permanently
    materialized over a GiST-indexed table (footprints.py:153-284):
    pay one clustering shuffle at ingest, never again.
    """
    df = spark.read.parquet(in_path)
    a = assign_tiles(with_geocode(df, territory), index)
    (
        a.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "tile_gid")
        .sortBy("tile_gid")
        .saveAsTable(table)
    )
    if analyze:
        # D4 parity (reference: ANALYZE after index build, db.py:67-77):
        # table-level rowCount/sizeInBytes plus tile_gid column stats
        # (distinct count, min/max) feed Catalyst's cost-based optimizer
        # — broadcast-vs-sort-merge decisions and join reordering read
        # these instead of guessing from file sizes
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS tile_gid"
        )


def ingest_pages_cells(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    territory: Rect,
    res: int = 3,
) -> None:
    """Cell-partitioned layout: geocode -> quadtree cell id at `res`
    (cells.cell_encode, vectorized) -> parquet PARTITIONED BY (cell).

    This is the directory-level partition-pruning analog of the
    reference's per-tile views: an extent query becomes a
    `cell IN (<cover set>)` predicate that Catalyst prunes at PLANNING
    time — unscanned cells never produce input splits (cf. the
    row-group-stat pruning of `ingest_pages`, which still lists every
    file).  `repartition(cell)` before the write keeps one file per
    cell directory instead of tasks x cells small files.  Choose `res`
    so 4^res partitions are each >= ~100 MB at the target scale
    (res 6-8 at 100 TB)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..cells import cell_encode

    @pandas_udf("long")
    def enc(xs, ys):
        return pd.Series(cell_encode(xs.to_numpy(), ys.to_numpy(), res, territory))

    df = with_geocode(spark.read.parquet(in_path), territory)
    (
        df.withColumn("cell", enc(F.col("x"), F.col("y")))
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_path)
    )


def read_pages_extent(
    spark: SparkSession,
    path: str,
    extent_poly,
    territory: Rect,
    res: int = 3,
):
    """Partition-pruned extent read over a cell-partitioned table:
    the extent's bbox is rewritten to its covering cell set
    (cells.cell_cover_rect) and pushed as `cell IN (...)` — partition
    pruning drops every other directory before any file is opened —
    then the exact select-not-clip polygon filter (P3) runs on the
    survivors only."""
    import numpy as np

    from ..cells import cell_cover_rect
    from ..geo import polygon_bbox
    from ..operators.tiler import extent_filter

    poly = np.asarray(extent_poly, dtype=np.float64)
    bbox = polygon_bbox(poly)
    cover = cell_cover_rect(
        Rect(bbox.xmin, bbox.ymin, bbox.xmax, bbox.ymax), res, territory
    )
    df = spark.read.parquet(path).where(
        F.col("cell").isin([int(c) for c in cover])
    )
    return extent_filter(df, poly)
