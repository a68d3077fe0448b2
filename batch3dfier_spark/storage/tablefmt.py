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
        conservatively."""
        name = snap.get("manifest")
        if name is None:
            return [], []
        m = self._manifest(name)
        sid = snap["snapshot_id"]
        if "lineage_parquet" in m:
            files: list[str] = []
            rows: list[dict] = []
            for part in m["lineage_parquet"]:
                if not self._stats_overlap(part, lo, hi):
                    continue
                for r in self._part_rows(part["path"]):
                    if not self._in_range(r["tile_gid"], lo, hi):
                        continue
                    files.extend(r.get("paths") or [])
                    rows.append(
                        {k: r[k] for k in _LINEAGE_COLS if k != "snapshot_id"}
                        | {"snapshot_id": sid}
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
        1000-commit table touches ~1 manifest, not 1000."""
        chain: list[dict] = []
        sid: int | None = snapshot_id
        base_files: list[str] = []
        base_lineage: list[dict] = []
        pruning = min_tile is not None or max_tile is not None
        while sid is not None:
            snap = self._raw_snapshot(sid)
            if "manifest" in snap:
                if not pruning or self._stats_overlap(
                    snap.get("stats"), min_tile, max_tile
                ):
                    chain.append(snap)
                sid = snap["parent"]
            else:  # legacy cumulative snapshot: already holds full history
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
        for snap in reversed(chain):  # oldest -> newest
            f, r = self._commit_content(
                snap, min_tile if pruning else None,
                max_tile if pruning else None,
            )
            files.extend(f)
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
                       stats: dict | None) -> int:
        """Shared commit tail: O(1) snapshot pointer (carrying the
        commit-level tile stats used for pruned chain walks), then
        atomically swap CURRENT."""
        snap: dict = {"snapshot_id": sid, "parent": parent,
                      "manifest": manifest_name}
        if stats is not None:
            snap["stats"] = stats
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
        import pyarrow.parquet as pq

        sid, parent = self._next_sid()
        parts: list[dict] = []
        if os.path.isdir(staged_dir):
            for n in sorted(os.listdir(staged_dir)):
                if not n.endswith(".parquet"):
                    continue
                p = os.path.join(staged_dir, n)
                md = pq.ParquetFile(p).metadata
                if md.num_rows == 0:
                    continue
                idx = next(
                    (i for i in range(md.num_columns)
                     if md.row_group(0).column(i).path_in_schema
                     == "tile_gid"),
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
                parts.append(
                    {"path": os.path.relpath(p, self.root),
                     "n_rows": md.num_rows,
                     "min_tile": min(mins) if mins else None,
                     "max_tile": max(maxs) if maxs else None}
                )
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
                if "lineage_parquet" in m:
                    part_paths.extend(p["path"] for p in m["lineage_parquet"])
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
        metadata walk (Iceberg-style partition-summary skipping)."""
        fs = self.files(snapshot_id, min_tile, max_tile)
        if not fs:
            raise ValueError("empty table (no committed snapshot)")
        return spark.read.parquet(*fs)

    # -- task-side helpers ------------------------------------------------------

    def new_data_path(self, tile_gid: int) -> str:
        d = os.path.join(self.data_dir, f"tile_gid={tile_gid}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{uuid.uuid4().hex}.parquet")

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
