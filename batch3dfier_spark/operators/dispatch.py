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

from ..storage.tablefmt import IcebergishTable, LineageRow

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
) -> pd.DataFrame:
    """Run `process` once per tile group; write per-tile parquet into
    `table`; commit atomically; return the lineage frame for this run.

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
    """
    completed = table.completed_tiles() if resume else set()
    skip_tiles = set(skip_tiles or ())

    work = df
    if completed:
        work = work.where(~F.col(tile_col).isin([int(t) for t in completed]))
    todo_skip = skip_tiles - completed
    if todo_skip:
        work = work.where(~F.col(tile_col).isin([int(t) for t in todo_skip]))

    data_root = table.data_dir
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
            d = os.path.join(data_root, f"tile_gid={tile}")
            os.makedirs(d, exist_ok=True)
            import uuid as _uuid

            path = os.path.join(d, f"{_uuid.uuid4().hex}.parquet")
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
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

    lineage_pdf = (
        work.groupBy(*group_cols)
        .applyInPandas(worker, schema=_LINEAGE_SCHEMA + ", path string")
        .toPandas()
    )

    import json as _json

    proc_name = getattr(process, "__name__", "process")
    if decomposable and len(lineage_pdf):
        # fold per-(tile, salt) partials into ONE lineage row per tile:
        # the tile is complete only when the whole run commits (the
        # commit is atomic), so per-tile resume semantics are unchanged
        agg = lineage_pdf.groupby("tile_gid").agg(
            partition_id=("partition_id", "max"),
            rows_in=("rows_in", "sum"),
            rows_out=("rows_out", "sum"),
            wall_ms=("wall_ms", "max"),
            # written parts only: empty (tile, salt) subgroups carry
            # path == "" and are not parquet parts
            n_parts=("path", lambda s: int((s != "").sum())),
            any_ok=("status", lambda s: (s == "ok").any()),
        )
        rows = [
            LineageRow(
                tile_gid=int(t),
                partition_id=int(r.partition_id),
                rows_in=int(r.rows_in),
                rows_out=int(r.rows_out),
                wall_ms=float(r.wall_ms),
                status="ok" if r.any_ok else "empty",
                work_order=_json.dumps(
                    {"tile": int(t), "salt_groups": int(r.n_parts),
                     "processor": proc_name}
                ),
            )
            for t, r in agg.iterrows()
        ]
    else:
        rows = [
            LineageRow(
                tile_gid=int(r.tile_gid),
                partition_id=int(r.partition_id),
                rows_in=int(r.rows_in),
                rows_out=int(r.rows_out),
                wall_ms=float(r.wall_ms),
                status=str(r.status),
                work_order=_json.dumps(
                    {"tile": int(r.tile_gid), "salt_groups": 1,
                     "processor": proc_name}
                ),
            )
            for r in lineage_pdf.itertuples()
        ]
    rows += [
        LineageRow(tile_gid=int(t), partition_id=-1, rows_in=0, rows_out=0,
                   wall_ms=0.0, status="skipped",
                   work_order=_json.dumps({"tile": int(t), "salt_groups": 0,
                                           "processor": proc_name}))
        for t in sorted(todo_skip)
    ]
    new_files = [p for p in lineage_pdf["path"] if p]
    table.commit(new_files, rows)
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
    processed = tiles - skipped."""
    by = lineage.groupby("status")["tile_gid"].nunique().to_dict()
    return {
        "tiles_total": int(lineage["tile_gid"].nunique()),
        "tiles_ok": int(by.get("ok", 0)) + int(by.get("empty", 0)),
        "tiles_skipped": int(by.get("skipped", 0)),
    }
