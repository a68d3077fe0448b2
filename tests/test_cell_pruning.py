"""Cell-partitioned layout: an extent query must PRUNE partitions at
planning time (unscanned cells never become input splits) and return
exactly the same rows as the unpruned polygon filter."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from batch3dfier_spark import datagen
from batch3dfier_spark.operators.tiler import extent_filter, with_geocode
from batch3dfier_spark.sources.pages import ingest_pages_cells, read_pages_extent

T = datagen.REF_TERRITORY
RES = 3  # 8x8 = 64 cells


@pytest.fixture(scope="module")
def cell_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cells")
    raw = str(root / "pages")
    out = str(root / "pages_cells")
    datagen.gen_pages_spark(spark, 4000, raw, partitions=4)
    ingest_pages_cells(spark, raw, out, T, res=RES)
    return raw, out


def test_extent_read_prunes_partitions(spark, cell_table):
    raw, out = cell_table
    n_files_total = len(spark.read.parquet(out).inputFiles())
    # rebuild the pruned scan's cell-IN predicate exactly as
    # read_pages_extent does, and count the files ACTUALLY touched
    # (inputFiles() lists the unpruned index, so it cannot show pruning)
    from batch3dfier_spark.cells import cell_cover_rect
    from batch3dfier_spark.geo import polygon_bbox

    cover = cell_cover_rect(polygon_bbox(datagen.EXTENT_SMALL), RES, T)
    scan = spark.read.parquet(out).where(
        F.col("cell").isin([int(c) for c in cover])
    )
    n_files_read = (
        scan.select(F.input_file_name().alias("f")).distinct().count()
    )
    # the small extent's bbox covers 16 of the 64 cells at res 3
    assert 0 < n_files_read <= len(cover) < n_files_total / 2
    # and the planned scan carries the cell partition filter
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # the full pruned+filtered read keeps the partition filter too
    pruned = read_pages_extent(spark, out, datagen.EXTENT_SMALL, T, res=RES)
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in pplan


def test_pruned_extent_read_matches_unpruned_filter(spark, cell_table):
    raw, out = cell_table
    got = sorted(
        read_pages_extent(spark, out, datagen.EXTENT_SMALL, T, res=RES)
        .select("url")
        .toPandas()["url"]
    )
    exp_df = extent_filter(
        with_geocode(spark.read.parquet(raw), T), datagen.EXTENT_SMALL
    )
    exp = sorted(exp_df.select("url").toPandas()["url"])
    assert got == exp and len(got) > 0


def test_one_file_per_cell_directory(spark, cell_table):
    """repartition(cell) before the partitioned write keeps the layout
    compact — one file per cell directory, not tasks x cells."""
    import os

    _, out = cell_table
    dirs = [d for d in os.listdir(out) if d.startswith("cell=")]
    assert len(dirs) > 8
    for d in dirs:
        parts = [p for p in os.listdir(os.path.join(out, d))
                 if p.endswith(".parquet")]
        assert len(parts) == 1, d
