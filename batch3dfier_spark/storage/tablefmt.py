"""Iceberg-style table format over parquet: snapshots, manifests, lineage.

The reference's restart-relevant state is per-tile YAML configs plus a
completed/skipped bookkeeping dict (config.py:73-84, batch3dfierapp.py:
242-245); a re-run reprocesses everything.  Our engine upgrades that to
checkpointed resumability (north_rule): every per-tile work unit commits
atomically — data files plus ONE lineage row (tile_id, partition_id,
rows_in, rows_out, wall_ms, status) — into a snapshot log, and a new run
resumes by anti-joining the work list against completed tiles.

Layout (no Iceberg jar in this sandbox; same commit semantics, same
manifest-list indirection real Iceberg uses so metadata cost is
O(new files) per commit, NOT O(table history)):

    root/
      data/tile_gid=<gid>/<uuid>.parquet       # task-written data files
      metadata/
        manifest-000001-<uuid>.json            # IMMUTABLE: only the files
                                               #   + lineage ADDED by that
                                               #   commit
        snapshot-000001.json                   # {snapshot_id, parent,
                                               #   manifest} — O(1) bytes
        CURRENT                                # name of current snapshot

Commit = write one manifest holding ONLY this commit's new files and
lineage rows, write an O(1) snapshot pointer referencing it, then
atomically `os.replace` the CURRENT pointer.  Readers resolve a snapshot
by walking the parent chain and concatenating manifests (cached
per-instance — manifests are immutable so the cache never invalidates).
Half-written runs stay invisible: nothing references an uncommitted
manifest.  Total metadata bytes across n commits grow LINEARLY in rows
written (each file path / lineage row is serialized exactly once, in
exactly one manifest), vs the pre-round-3 format that re-serialized the
full cumulative history into every snapshot (O(n^2)).  On a real cluster
the same protocol runs against an object store / a real Iceberg catalog —
the interface is kept thin on purpose (SURVEY.md §7.0).

Legacy snapshots (pre-manifest format, with inline cumulative
"files"/"lineage") are still readable: the chain walk treats them as a
base prefix and stops there.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass

import pandas as pd

__all__ = ["LineageRow", "IcebergishTable"]

_LINEAGE_COLS = ["tile_gid", "partition_id", "rows_in", "rows_out",
                 "wall_ms", "status", "snapshot_id", "work_order"]


@dataclass
class LineageRow:
    tile_gid: int
    partition_id: int
    rows_in: int
    rows_out: int
    wall_ms: float
    status: str  # ok | skipped | empty
    snapshot_id: int = -1  # filled at commit
    # S5 parity: the per-tile work order the reference renders as a
    # YAML config (config.py:115-178), kept as a JSON string —
    # {"tile": gid, "salt_groups": n, "processor": name}
    work_order: str = ""


class IcebergishTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)
        # Immutable-object caches: manifests, snapshot pointers, and
        # staged-lineage parquet parts never change once written, so
        # these only ever grow.
        self._manifest_cache: dict[str, dict] = {}
        self._snap_cache: dict[int, dict] = {}
        self._part_cache: dict[str, list[dict]] = {}

    # -- path portability ---------------------------------------------------
    # Manifests store data-file paths RELATIVE to the table root whenever
    # the file lives under it, so a table directory (or an exported
    # artifact) can be moved/copied and still read.  Absolute paths (e.g.
    # files outside the root, legacy manifests) pass through untouched.

    def _rel(self, p: str) -> str:
        root = os.path.abspath(self.root)
        ap = os.path.abspath(p) if os.path.isabs(p) else None
        if ap is not None and ap.startswith(root + os.sep):
            return os.path.relpath(ap, root)
        return p

    def _abs(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    # -- snapshot chain -----------------------------------------------------

    def _current_name(self) -> str | None:
        p = os.path.join(self.meta_dir, "CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip() or None

    def _load_snap(self, name: str) -> dict:
        with open(os.path.join(self.meta_dir, name)) as f:
            return json.load(f)

    def _raw_snapshot(self, snapshot_id: int) -> dict:
        """On-disk snapshot record (pointer form, not resolved)."""
        snap = self._snap_cache.get(snapshot_id)
        if snap is None:
            p = os.path.join(self.meta_dir,
                             f"snapshot-{snapshot_id:06d}.json")
            if not os.path.exists(p):
                raise ValueError(f"no snapshot {snapshot_id}")
            with open(p) as f:
                snap = json.load(f)
            self._snap_cache[snapshot_id] = snap
        return snap

    def _manifest(self, name: str) -> dict:
        m = self._manifest_cache.get(name)
        if m is None:
            with open(os.path.join(self.meta_dir, name)) as f:
                m = json.load(f)
            self._manifest_cache[name] = m
        return m

    def _part_rows(self, rel_path: str) -> list[dict]:
        """Rows of one staged-lineage parquet part (immutable -> cached)."""
        rows = self._part_cache.get(rel_path)
        if rows is None:
            import pyarrow.parquet as pq

            rows = pq.read_table(self._abs(rel_path)).to_pylist()
            self._part_cache[rel_path] = rows
        return rows

    @staticmethod
    def _stats_overlap(stats: dict | None, lo: int | None,
                       hi: int | None) -> bool:
        """Can (stats) hold tiles in [lo, hi]?  Missing stats -> True
        (must read); empty commits -> False."""
        if stats is None:
            return True
        if stats.get("n_rows", 1) == 0:
            return False
        mn, mx = stats.get("min_tile"), stats.get("max_tile")
        if lo is not None and mx is not None and mx < lo:
            return False
        if hi is not None and mn is not None and mn > hi:
            return False
        return True

    @staticmethod
    def _tile_of_path(p: str) -> int | None:
        """Hive-style tile from a data path ('.../tile_gid=N/...')."""
        marker = "tile_gid="
        i = p.rfind(marker)
        if i < 0:
            return None
        j = i + len(marker)
        k = j
        while k < len(p) and p[k].isdigit():
            k += 1
        return int(p[j:k]) if k > j else None

    def _in_range(self, tile, lo, hi) -> bool:
        if lo is not None and tile < lo:
            return False
        if hi is not None and tile > hi:
            return False
        return True

    def _commit_content(
        self, snap: dict, lo: int | None, hi: int | None
    ) -> tuple[list[str], list[dict]]:
        """(files, lineage rows) contributed by ONE commit, tile-range
        pruned.  Staged-lineage manifests prune at part level via the
        per-part min/max stats (parquet row-group footers at commit
        time), then row-filter; inline manifests row-filter, and files
        whose tile can't be derived from a hive-style path are kept
        conservatively.  `data_files` entries (compaction rewrites,
        expiry rebases) prune via their per-file min/max tile stats."""
        name = snap.get("manifest")
        if name is None:
            return [], []
        m = self._manifest(name)
        sid = snap["snapshot_id"]
        if "lineage_parquet" in m or "data_files" in m:
            files: list[str] = []
            rows: list[dict] = []
            for df_entry in m.get("data_files", []):
                if self._stats_overlap(
                    {"min_tile": df_entry.get("min_tile"),
                     "max_tile": df_entry.get("max_tile")},
                    lo, hi,
                ):
                    files.append(df_entry["path"])
            for part in m.get("lineage_parquet", []):
                if not self._stats_overlap(part, lo, hi):
                    continue
                for r in self._part_rows(part["path"]):
                    if not self._in_range(r["tile_gid"], lo, hi):
                        continue
                    files.extend(r.get("paths") or [])
                    rows.append(
                        {k: r[k] for k in _LINEAGE_COLS if k != "snapshot_id"}
                        | {"snapshot_id": r.get("snapshot_id", sid)
                            if m.get("base") else sid}
                    )
            return files, rows
        files = list(m["files"])
        rows = list(m["lineage"])
        if lo is not None or hi is not None:
            rows = [r for r in rows if self._in_range(r["tile_gid"], lo, hi)]
            kept = []
            for f in files:
                t = self._tile_of_path(f)
                if t is None or self._in_range(t, lo, hi):
                    kept.append(f)
            files = kept
        return files, rows

    def _resolve_chain(
        self,
        snapshot_id: int,
        min_tile: int | None = None,
        max_tile: int | None = None,
    ) -> tuple[list[str], list[dict]]:
        """Cumulative (files, lineage rows) for a snapshot: walk the
        parent chain, oldest-first, concatenating per-commit manifests.
        O(total history) on first touch, O(1-ish) after via the
        immutable-manifest/part caches.  Legacy inline snapshots act as
        a cumulative base and terminate the walk.

        min_tile/max_tile prune the walk Iceberg-style: the snapshot
        pointer carries commit-level tile stats, so a commit whose range
        is disjoint is skipped WITHOUT opening its manifest (let alone
        its lineage parquet) — reading one tile's files from a
        1000-commit table touches ~1 manifest, not 1000.

        A REWRITE snapshot (compaction) carries the COMPLETE data-file
        set as of its commit: commits OLDER than the newest rewrite on
        the path contribute lineage history only, never files (their
        data files were superseded by the compacted ones)."""
        chain: list[tuple[dict, bool, bool]] = []  # (snap, files?, lineage?)
        sid: int | None = snapshot_id
        base_files: list[str] = []
        base_lineage: list[dict] = []
        pruning = min_tile is not None or max_tile is not None
        files_visible = True
        while sid is not None:
            snap = self._raw_snapshot(sid)
            if "manifest" in snap:
                inc_lin = not pruning or self._stats_overlap(
                    snap.get("stats"), min_tile, max_tile
                )
                inc_files = files_visible and (
                    not pruning or self._stats_overlap(
                        snap.get("file_stats", snap.get("stats")),
                        min_tile, max_tile,
                    )
                )
                if inc_lin or inc_files:
                    chain.append((snap, inc_files, inc_lin))
                if snap.get("rewrite"):
                    files_visible = False
                sid = snap["parent"]
            else:  # legacy cumulative snapshot: already holds full history
                if files_visible:
                    base_files = list(snap.get("files", []))
                base_lineage = list(snap.get("lineage", []))
                break
        if pruning:
            base_lineage = [
                r for r in base_lineage
                if self._in_range(r["tile_gid"], min_tile, max_tile)
            ]
            base_files = [
                f for f in base_files
                if (t := self._tile_of_path(f)) is None
                or self._in_range(t, min_tile, max_tile)
            ]
        files = list(base_files)
        lineage = list(base_lineage)
        for snap, inc_files, inc_lin in reversed(chain):  # oldest -> newest
            f, r = self._commit_content(
                snap, min_tile if pruning else None,
                max_tile if pruning else None,
            )
            if inc_files:
                files.extend(f)
            if inc_lin:
                lineage.extend(r)
        return [self._abs(f) for f in files], lineage

    def current_snapshot(self) -> dict | None:
        """Resolved view of the current snapshot (or None): the raw
        pointer plus materialized cumulative `files` and `lineage`."""
        name = self._current_name()
        if name is None:
            return None
        snap = self._load_snap(name)
        return self.snapshot(snap["snapshot_id"])

    def snapshot(self, snapshot_id: int) -> dict:
        """Resolved view of a specific snapshot by id (time travel —
        manifests are immutable, so any historical table state stays
        readable, like Iceberg's `VERSION AS OF`).  Returns
        {snapshot_id, parent, files, lineage} with files/lineage
        materialized from the manifest chain."""
        snap = self._raw_snapshot(snapshot_id)
        files, lineage = self._resolve_chain(snapshot_id)
        return {
            "snapshot_id": snap["snapshot_id"],
            "parent": snap.get("parent"),
            "files": files,
            "lineage": lineage,
        }

    def snapshots(self) -> list[int]:
        """All committed snapshot ids, ascending (the history log)."""
        out = []
        for n in os.listdir(self.meta_dir):
            if n.startswith("snapshot-") and n.endswith(".json"):
                out.append(int(n[len("snapshot-"):-len(".json")]))
        return sorted(out)

    def _write_atomic(self, name: str, payload) -> None:
        tmp = os.path.join(self.meta_dir, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(self.meta_dir, name))

    def _next_sid(self) -> tuple[int, int | None]:
        cur_name = self._current_name()
        parent = self._load_snap(cur_name)["snapshot_id"] if cur_name else None
        return (parent + 1) if parent else 1, parent

    def _finish_commit(self, sid: int, parent: int | None,
                       manifest_name: str | None,
                       stats: dict | None,
                       extra: dict | None = None) -> int:
        """Shared commit tail: O(1) snapshot pointer (carrying the
        commit-level tile stats used for pruned chain walks), then
        atomically swap CURRENT.  `extra` merges additional pointer
        fields (rewrite flag, file_stats) for maintenance commits."""
        snap: dict = {"snapshot_id": sid, "parent": parent,
                      "manifest": manifest_name}
        if stats is not None:
            snap["stats"] = stats
        if extra:
            snap.update(extra)
        snap_name = f"snapshot-{sid:06d}.json"
        self._write_atomic(snap_name, snap)
        ptmp = os.path.join(self.meta_dir, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(ptmp, "w") as f:
            f.write(snap_name)
        os.replace(ptmp, os.path.join(self.meta_dir, "CURRENT"))
        return sid

    def commit(self, new_files: list[str], lineage: list[LineageRow]) -> int:
        """Atomic append commit, O(new files + new lineage) metadata I/O:
        write one immutable manifest with only this commit's additions,
        then an O(1) snapshot pointer, then swap CURRENT."""
        sid, parent = self._next_sid()
        rows = []
        for r in lineage:
            r.snapshot_id = sid
            rows.append(asdict(r))
        manifest_name = None
        if new_files or rows:
            manifest_name = f"manifest-{sid:06d}-{uuid.uuid4().hex}.json"
            self._write_atomic(
                manifest_name,
                {"snapshot_id": sid,
                 "files": [self._rel(f) for f in new_files],
                 "lineage": rows},
            )
        if rows:
            tiles = [r["tile_gid"] for r in rows]
            stats = {"n_rows": len(rows), "min_tile": min(tiles),
                     "max_tile": max(tiles)}
        elif new_files:
            stats = None  # files without lineage: range unknown, no pruning
        else:
            stats = {"n_rows": 0}
        return self._finish_commit(sid, parent, manifest_name, stats)

    def _footer_file_stats(self, d: str) -> list[dict]:
        """Per-file {path (root-relative), n_rows, min_tile, max_tile}
        for every non-empty .parquet under `d`, from parquet FOOTERS
        only (row-group statistics of the `tile_gid` column — never the
        data pages).  Shared by commit_staged (staged-lineage parts) and
        compact (rewritten data files)."""
        parts: list[dict] = []
        if not os.path.isdir(d):
            return parts
        for n in sorted(os.listdir(d)):
            if not n.endswith(".parquet"):
                continue
            e = self._file_stat(os.path.join(d, n))
            if e is not None:
                parts.append(e)
        return parts

    def _file_stat(self, p: str) -> dict | None:
        """Footer-only stats entry for one parquet file (None if the
        file is empty): {path (root-relative), n_rows, min_tile,
        max_tile} with the tile range from `tile_gid` row-group
        statistics where the column exists."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(p).metadata
        if md.num_rows == 0:
            return None
        idx = next(
            (i for i in range(md.num_columns)
             if md.row_group(0).column(i).path_in_schema == "tile_gid"),
            None,
        ) if md.num_row_groups else None
        mins: list[int] = []
        maxs: list[int] = []
        if idx is not None:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(int(st.min))
                    maxs.append(int(st.max))
        return {"path": os.path.relpath(p, self.root),
                "n_rows": md.num_rows,
                "min_tile": min(mins) if mins else None,
                "max_tile": max(maxs) if maxs else None}

    def stage_dir(self) -> str:
        """A fresh directory under metadata/ for a DISTRIBUTED lineage
        write (Spark writes parquet parts straight into it — executor-
        side, nothing through the driver).  Invisible until
        commit_staged references it from a manifest."""
        return os.path.join(self.meta_dir, f"lineage-{uuid.uuid4().hex}")

    def commit_staged(self, staged_dir: str) -> int:
        """Atomic commit of a staged-lineage directory (the de-drivered
        dispatch path): lineage rows — including each tile's data-file
        paths in a `paths` array column — were written as parquet parts
        by the executors.  The driver reads only the parquet FOOTERS
        (row counts + tile_gid row-group min/max) to build per-part
        stats, writes a manifest listing the parts, and the usual O(1)
        pointer.  Driver I/O is O(parts) (~shuffle partitions), not
        O(tiles)."""
        sid, parent = self._next_sid()
        parts = self._footer_file_stats(staged_dir)
        manifest_name = None
        stats: dict | None = {"n_rows": 0}
        if parts:
            manifest_name = f"manifest-{sid:06d}-{uuid.uuid4().hex}.json"
            self._write_atomic(
                manifest_name,
                {"snapshot_id": sid, "lineage_parquet": parts},
            )
            mins = [p["min_tile"] for p in parts if p["min_tile"] is not None]
            maxs = [p["max_tile"] for p in parts if p["max_tile"] is not None]
            stats = {"n_rows": sum(p["n_rows"] for p in parts),
                     "min_tile": min(mins) if mins else None,
                     "max_tile": max(maxs) if maxs else None}
        return self._finish_commit(sid, parent, manifest_name, stats)

    # -- reads ----------------------------------------------------------------

    def _current_sid(self) -> int | None:
        name = self._current_name()
        if name is None:
            return None
        return self._load_snap(name)["snapshot_id"]

    def files(
        self,
        snapshot_id: int | None = None,
        min_tile: int | None = None,
        max_tile: int | None = None,
    ) -> list[str]:
        """Committed data files, optionally restricted to a tile range —
        the pruned path walks the snapshot pointers' commit-level stats
        and never opens a disjoint commit's manifest or lineage parts."""
        if snapshot_id is None:
            snapshot_id = self._current_sid()
            if snapshot_id is None:
                return []
        return self._resolve_chain(snapshot_id, min_tile, max_tile)[0]

    def lineage(
        self,
        snapshot_id: int | None = None,
        min_tile: int | None = None,
        max_tile: int | None = None,
    ) -> pd.DataFrame:
        if snapshot_id is None:
            snapshot_id = self._current_sid()
            if snapshot_id is None:
                return pd.DataFrame(columns=_LINEAGE_COLS)
        rows = self._resolve_chain(snapshot_id, min_tile, max_tile)[1]
        if not rows:
            return pd.DataFrame(columns=_LINEAGE_COLS)
        pdf = pd.DataFrame(rows)
        if "work_order" not in pdf.columns:  # pre-upgrade snapshots
            pdf["work_order"] = ""
        return pdf[_LINEAGE_COLS]

    def lineage_row_bound(self) -> int:
        """Upper bound on committed lineage rows, from pointer stats
        alone where present (manifests are opened only for legacy
        commits) — lets callers decide between a driver-side completed
        set and a distributed anti-join without materializing either."""
        sid = self._current_sid()
        if sid is None:
            return 0
        total = 0
        cur: int | None = sid
        while cur is not None:
            snap = self._raw_snapshot(cur)
            if "manifest" not in snap:  # legacy cumulative base
                total += len(snap.get("lineage", []))
                break
            stats = snap.get("stats")
            if stats is not None:
                total += stats.get("n_rows", 0)
            elif snap["manifest"] is not None:
                f, r = self._commit_content(snap, None, None)
                total += len(r)
            cur = snap["parent"]
        return total

    def completed_tiles(self) -> set[int]:
        lin = self.lineage()
        if lin.empty:
            return set()
        done = lin[lin["status"].isin(["ok", "empty", "skipped"])]
        return set(done["tile_gid"].astype(int))

    def completed_tiles_df(self, spark):
        """Distinct completed tile_gids as a Spark DataFrame — the
        scale-path resume input: staged-lineage parquet parts are read
        by Spark DIRECTLY (executor-side, nothing materialized on the
        driver); inline-JSON lineage rows (small by construction — they
        only come from the driver-side commit() API) ride along via
        createDataFrame.  Returns None for an empty table."""
        from pyspark.sql import functions as F

        sid = self._current_sid()
        if sid is None:
            return None
        part_paths: list[str] = []
        inline: list[tuple[int, str]] = []
        cur: int | None = sid
        while cur is not None:
            snap = self._raw_snapshot(cur)
            if "manifest" not in snap:
                inline.extend(
                    (int(r["tile_gid"]), str(r["status"]))
                    for r in snap.get("lineage", [])
                )
                break
            name = snap["manifest"]
            if name is not None:
                m = self._manifest(name)
                if "lineage_parquet" in m or "data_files" in m:
                    part_paths.extend(
                        p["path"] for p in m.get("lineage_parquet", [])
                    )
                else:
                    inline.extend(
                        (int(r["tile_gid"]), str(r["status"]))
                        for r in m["lineage"]
                    )
            cur = snap["parent"]
        dfs = []
        if part_paths:
            dfs.append(
                spark.read.parquet(*[self._abs(p) for p in part_paths])
                .select("tile_gid", "status")
            )
        if inline:
            dfs.append(
                spark.createDataFrame(inline, "tile_gid bigint, status string")
            )
        if not dfs:
            return None
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d)
        return (
            df.where(F.col("status").isin("ok", "empty", "skipped"))
            .select("tile_gid")
            .distinct()
        )

    def read(self, spark, snapshot_id: int | None = None,
             min_tile: int | None = None, max_tile: int | None = None):
        """Committed-snapshot view as a DataFrame (reads only committed
        files — uncommitted task output is invisible).  snapshot_id
        reads the table AS OF that commit (time travel); min_tile/
        max_tile restrict the scan to that tile range via the pruned
        metadata walk (Iceberg-style partition-summary skipping).

        When the data carries a row-level `tile_gid` column (every file
        run_tiles writes, and every compacted file), a pruned read ALSO
        applies the range as a row filter, so the result is tile-exact
        even when a compacted file spans several tiles — the file-level
        prune is the scan optimization, the filter is the contract (the
        split Iceberg itself makes).  The row filter is NULL-tolerant:
        in a MIXED table (pre-upgrade per-tile files without the
        column, plus new/compacted files with it) the old files' rows
        surface as NULL tile_gid under the unified schema, but they
        are already tile-exact via the per-tile file prune — dropping
        them would silently lose committed rows (round-5 ADVICE)."""
        fs = self.files(snapshot_id, min_tile, max_tile)
        if not fs:
            raise ValueError("empty table (no committed snapshot)")
        df = spark.read.option("mergeSchema", "true").parquet(*fs)
        if (min_tile is not None or max_tile is not None) \
                and "tile_gid" in df.columns:
            from pyspark.sql import functions as F

            rng = F.lit(True)
            if min_tile is not None:
                rng = rng & (F.col("tile_gid") >= min_tile)
            if max_tile is not None:
                rng = rng & (F.col("tile_gid") <= max_tile)
            df = df.where(F.col("tile_gid").isNull() | rng)
        return df

    # -- task-side helpers ------------------------------------------------------

    def new_data_path(self, tile_gid: int) -> str:
        d = os.path.join(self.data_dir, f"tile_gid={tile_gid}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{uuid.uuid4().hex}.parquet")

    # -- maintenance (compaction, snapshot expiry, vacuum) --------------------
    # The reference delegates table maintenance to Postgres — db.vacuum
    # runs VACUUM ANALYZE after bulk loads (batch3dfier/db.py:62-83).
    # An Iceberg-style table needs the jobs Postgres does implicitly:
    # rewriting many small files into few (Iceberg rewriteDataFiles),
    # retiring old snapshots (expire_snapshots), and reclaiming
    # unreferenced storage (remove_orphan_files).  Without them a
    # 1e6-tile run leaves ~1e6 small files per pass and the manifest
    # chain grows unboundedly across runs.

    def compact(self, spark, target_file_rows: int = 4_000_000) -> int:
        """Rewrite the current snapshot's data into ~rows/target
        TILE-RANGE-SORTED files and commit them as a REWRITE snapshot
        (Iceberg rewriteDataFiles binpack+sort).  The rewrite manifest
        carries the complete replacement file set with per-file tile
        ranges, so older commits keep contributing lineage history but
        never files; every pre-compaction snapshot stays time-travel
        readable until expired.  Lineage, resume, and skip bookkeeping
        are untouched — compaction changes layout, not state.

        The shuffle is ONE range repartition on tile_gid (sampled range
        boundaries make output files contiguous tile runs, so pruned
        reads touch few files); the write is executor-side; the commit
        reads only output parquet footers.  Files written before the
        row-level tile_gid column upgrade derive their tile from the
        hive-style path during the rewrite."""
        import math
        import shutil

        from pyspark.sql import functions as F

        fs = self.files()
        if not fs:
            raise ValueError("empty table (no committed snapshot)")
        df = spark.read.parquet(*fs)
        if "tile_gid" not in df.columns:
            df = df.withColumn(
                "tile_gid",
                F.regexp_extract(
                    F.input_file_name(), r"tile_gid=(\d+)", 1
                ).cast("bigint"),
            )
        total = df.count()
        n_out = max(1, math.ceil(total / target_file_rows))
        out_rel = os.path.join("data", f"compact-{uuid.uuid4().hex}")
        out_dir = os.path.join(self.root, out_rel)
        try:
            (
                df.repartitionByRange(n_out, "tile_gid")
                .sortWithinPartitions("tile_gid")
                .write.parquet(out_dir)
            )
            entries = self._footer_file_stats(out_dir)
            sid, parent = self._next_sid()
            manifest_name = f"manifest-{sid:06d}-{uuid.uuid4().hex}.json"
            self._write_atomic(
                manifest_name,
                {"snapshot_id": sid, "data_files": entries},
            )
            mins = [e["min_tile"] for e in entries
                    if e["min_tile"] is not None]
            maxs = [e["max_tile"] for e in entries
                    if e["max_tile"] is not None]
            return self._finish_commit(
                sid, parent, manifest_name,
                {"n_rows": 0},  # a rewrite adds no lineage
                extra={
                    "rewrite": True,
                    "file_stats": {
                        "n_rows": sum(e["n_rows"] for e in entries),
                        "min_tile": min(mins) if mins else None,
                        "max_tile": max(maxs) if maxs else None,
                    },
                },
            )
        except BaseException:
            shutil.rmtree(out_dir, ignore_errors=True)
            raise

    def expire_snapshots(self, keep_n: int = 2) -> list[int]:
        """Retire all but the newest `keep_n` snapshots (Iceberg
        expire_snapshots): the oldest RETAINED snapshot is rebased into
        a self-contained base manifest — its cumulative file set (with
        per-file tile stats, so pruned walks keep skipping) plus its
        cumulative lineage as one parquet part with per-row original
        snapshot_id — then the expired pointers/manifests are deleted
        and vacuum() reclaims everything no retained snapshot
        references (superseded pre-compaction files included).

        Time travel to retained snapshots is unchanged (the rebase
        preserves files, lineage, and lineage attribution exactly);
        expired ids raise.  Driver cost is O(base files + base lineage)
        — the same class as the manifest scan Iceberg's own maintenance
        actions run.  Returns the expired snapshot ids."""
        if keep_n < 1:
            raise ValueError("keep_n must be >= 1")
        sids = self.snapshots()
        if len(sids) <= keep_n:
            return []
        expired, kept = sids[:-keep_n], sids[-keep_n:]
        base_sid = kept[0]
        files, lineage = self._resolve_chain(base_sid)

        entries: list[dict] = []
        for f in files:
            t = self._tile_of_path(f)
            e = None
            if t is None and os.path.exists(f):
                e = self._file_stat(f)  # compacted file: footer range
            if e is None:
                e = {"path": self._rel(f),
                     "n_rows": None, "min_tile": t, "max_tile": t}
            else:
                e["path"] = self._rel(f)
            entries.append(e)

        parts: list[dict] = []
        if lineage:
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = pa.schema([
                ("tile_gid", pa.int64()), ("partition_id", pa.int32()),
                ("rows_in", pa.int64()), ("rows_out", pa.int64()),
                ("wall_ms", pa.float64()), ("status", pa.string()),
                ("snapshot_id", pa.int64()), ("work_order", pa.string()),
            ])
            rows = [
                {"tile_gid": int(r["tile_gid"]),
                 "partition_id": int(r.get("partition_id") or 0),
                 "rows_in": int(r.get("rows_in") or 0),
                 "rows_out": int(r.get("rows_out") or 0),
                 "wall_ms": float(r.get("wall_ms") or 0.0),
                 "status": str(r.get("status", "")),
                 "snapshot_id": int(r.get("snapshot_id") or base_sid),
                 "work_order": str(r.get("work_order") or "")}
                for r in lineage
            ]
            part_dir = os.path.join(
                self.meta_dir, f"lineage-base-{uuid.uuid4().hex}")
            os.makedirs(part_dir, exist_ok=True)
            part_path = os.path.join(part_dir, "part-0.parquet")
            pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                           part_path)
            tiles = [r["tile_gid"] for r in rows]
            parts.append({"path": os.path.relpath(part_path, self.root),
                          "n_rows": len(rows),
                          "min_tile": min(tiles), "max_tile": max(tiles)})

        base_name = f"manifest-{base_sid:06d}-{uuid.uuid4().hex}.json"
        self._write_atomic(
            base_name,
            {"snapshot_id": base_sid, "base": True,
             "data_files": entries, "lineage_parquet": parts},
        )
        mins = [e["min_tile"] for e in entries if e["min_tile"] is not None]
        maxs = [e["max_tile"] for e in entries if e["max_tile"] is not None]
        lin_tiles = [p for p in parts]
        self._write_atomic(
            f"snapshot-{base_sid:06d}.json",
            {"snapshot_id": base_sid, "parent": None,
             "manifest": base_name,
             "stats": {
                 "n_rows": sum(p["n_rows"] for p in lin_tiles),
                 "min_tile": min((p["min_tile"] for p in lin_tiles),
                                 default=None),
                 "max_tile": max((p["max_tile"] for p in lin_tiles),
                                 default=None),
             },
             "file_stats": {
                 "n_rows": len(entries),
                 "min_tile": min(mins) if mins else None,
                 "max_tile": max(maxs) if maxs else None,
             },
             "base": True},
        )
        self._snap_cache.pop(base_sid, None)
        for sid in expired:
            p = os.path.join(self.meta_dir, f"snapshot-{sid:06d}.json")
            if os.path.exists(p):
                os.remove(p)
            self._snap_cache.pop(sid, None)
        self.vacuum()
        return expired

    def vacuum(self) -> dict:
        """Reclaim everything NO committed snapshot references: data
        files (e.g. pre-compaction small files once their snapshots
        expired), staged-lineage parts and dirs (including orphans from
        runs that died between staging and commit — otherwise invisible
        but unbounded garbage), manifests written by failed commits,
        and stale .tmp files.  Run it only while no writer is in
        flight: a concurrently staged-but-uncommitted run looks like an
        orphan (the same caveat as Iceberg remove_orphan_files, which
        uses a retention interval for the purpose).  Returns removal
        counts."""
        ref_files: set[str] = set()
        ref_manifests: set[str] = set()
        ref_parts: set[str] = set()
        for sid in self.snapshots():
            snap = self._raw_snapshot(sid)
            if "manifest" not in snap:  # legacy cumulative snapshot
                ref_files.update(
                    os.path.abspath(self._abs(f))
                    for f in snap.get("files", []))
                continue
            name = snap.get("manifest")
            if name is None:
                continue
            ref_manifests.add(name)
            m = self._manifest(name)
            ref_files.update(
                os.path.abspath(self._abs(f)) for f in m.get("files", []))
            ref_files.update(
                os.path.abspath(self._abs(e["path"]))
                for e in m.get("data_files", []))
            for part in m.get("lineage_parquet", []):
                ref_parts.add(os.path.abspath(self._abs(part["path"])))
                for r in self._part_rows(part["path"]):
                    ref_files.update(
                        os.path.abspath(self._abs(p))
                        for p in (r.get("paths") or []))
        removed = {"data_files": 0, "lineage_parts": 0,
                   "manifests": 0, "tmp": 0}
        for root_, _dirs, names in os.walk(self.data_dir, topdown=False):
            for n in names:
                p = os.path.join(root_, n)
                if os.path.abspath(p) not in ref_files:
                    os.remove(p)
                    removed["data_files"] += 1
            if root_ != self.data_dir and not os.listdir(root_):
                os.rmdir(root_)
        for n in list(os.listdir(self.meta_dir)):
            p = os.path.join(self.meta_dir, n)
            if (n.startswith("manifest-") and n.endswith(".json")
                    and n not in ref_manifests):
                os.remove(p)
                self._manifest_cache.pop(n, None)
                removed["manifests"] += 1
            elif n.startswith(".") and n.endswith(".tmp"):
                os.remove(p)
                removed["tmp"] += 1
            elif os.path.isdir(p) and n.startswith("lineage-"):
                for rr, _dd, ff in os.walk(p, topdown=False):
                    for fn in ff:
                        fp = os.path.join(rr, fn)
                        if os.path.abspath(fp) not in ref_parts:
                            os.remove(fp)
                            removed["lineage_parts"] += 1
                    if not os.listdir(rr):
                        os.rmdir(rr)
        return removed

    # -- export (S9) ----------------------------------------------------------

    def export_snapshot(self, snapshot_id: int | None, out_dir: str) -> str:
        """S9 parity: export one snapshot as a SELF-CONTAINED artifact —
        the analog of the reference's dump entry point (bag3d.py:239-329:
        pg_dump schema + ogr2ogr -> GeoPackage file a user can carry
        away).  Copies the snapshot's data files under out_dir/data/,
        writes a single manifest with RELATIVE-to-out_dir paths plus the
        full lineage history, and a human-readable lineage.csv.  The
        artifact is itself a valid one-snapshot IcebergishTable:
        `IcebergishTable(out_dir).read(spark)` returns exactly
        `self.read(spark, snapshot_id)`.

        At cluster scale the per-file copy loop is an object-store
        server-side copy per data file (no driver byte traffic); here it
        is shutil.  Returns out_dir."""
        import shutil

        if snapshot_id is None:
            cur = self._current_name()
            if cur is None:
                raise ValueError("empty table (no committed snapshot)")
            snapshot_id = self._load_snap(cur)["snapshot_id"]
        files, lineage = self._resolve_chain(snapshot_id)
        out = IcebergishTable(out_dir)
        rel_files = []
        for src in files:
            # keep the tile_gid=<n>/ partition dir so partition-style
            # layouts survive the round trip
            rel = os.path.join("data", os.path.basename(os.path.dirname(src)),
                               os.path.basename(src))
            dst = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
            # RELATIVE in the manifest: the artifact stays readable after
            # being moved/copied (resolved against the artifact root at
            # read time by _abs)
            rel_files.append(rel)
        manifest_name = f"manifest-000001-{uuid.uuid4().hex}.json"
        out._write_atomic(
            manifest_name,
            {"snapshot_id": 1, "files": rel_files, "lineage": lineage},
        )
        out._write_atomic(
            "snapshot-000001.json",
            {"snapshot_id": 1, "parent": None, "manifest": manifest_name,
             "exported_from": {"root": self.root,
                               "snapshot_id": snapshot_id}},
        )
        with open(os.path.join(out.meta_dir, "CURRENT"), "w") as f:
            f.write("snapshot-000001.json")
        pd.DataFrame(lineage).to_csv(
            os.path.join(out_dir, "lineage.csv"), index=False)
        return out_dir
