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
        # Immutable-object caches: manifests and snapshot pointers never
        # change once written, so these only ever grow.
        self._manifest_cache: dict[str, dict] = {}
        self._snap_cache: dict[int, dict] = {}

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

    def _resolve_chain(self, snapshot_id: int) -> tuple[list[str], list[dict]]:
        """Cumulative (files, lineage rows) for a snapshot: walk the
        parent chain, oldest-first, concatenating per-commit manifests.
        O(total history) on first touch, O(1-ish) after via the
        immutable-manifest cache.  Legacy inline snapshots act as a
        cumulative base and terminate the walk."""
        chain: list[dict] = []
        sid: int | None = snapshot_id
        base_files: list[str] = []
        base_lineage: list[dict] = []
        while sid is not None:
            snap = self._raw_snapshot(sid)
            if "manifest" in snap:
                chain.append(snap)
                sid = snap["parent"]
            else:  # legacy cumulative snapshot: already holds full history
                base_files = list(snap.get("files", []))
                base_lineage = list(snap.get("lineage", []))
                break
        files = list(base_files)
        lineage = list(base_lineage)
        for snap in reversed(chain):  # oldest -> newest
            if snap["manifest"] is None:  # empty commit
                continue
            m = self._manifest(snap["manifest"])
            files.extend(m["files"])
            lineage.extend(m["lineage"])
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

    def commit(self, new_files: list[str], lineage: list[LineageRow]) -> int:
        """Atomic append commit, O(new files + new lineage) metadata I/O:
        write one immutable manifest with only this commit's additions,
        then an O(1) snapshot pointer, then swap CURRENT."""
        cur_name = self._current_name()
        parent = self._load_snap(cur_name)["snapshot_id"] if cur_name else None
        sid = (parent + 1) if parent else 1
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
        snap_name = f"snapshot-{sid:06d}.json"
        self._write_atomic(
            snap_name,
            {"snapshot_id": sid, "parent": parent, "manifest": manifest_name},
        )
        ptmp = os.path.join(self.meta_dir, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(ptmp, "w") as f:
            f.write(snap_name)
        os.replace(ptmp, os.path.join(self.meta_dir, "CURRENT"))
        return sid

    # -- reads ----------------------------------------------------------------

    def files(self, snapshot_id: int | None = None) -> list[str]:
        if snapshot_id is None:
            name = self._current_name()
            if name is None:
                return []
            snapshot_id = self._load_snap(name)["snapshot_id"]
        return self._resolve_chain(snapshot_id)[0]

    def lineage(self, snapshot_id: int | None = None) -> pd.DataFrame:
        if snapshot_id is None:
            name = self._current_name()
            if name is None:
                return pd.DataFrame(columns=_LINEAGE_COLS)
            snapshot_id = self._load_snap(name)["snapshot_id"]
        rows = self._resolve_chain(snapshot_id)[1]
        if not rows:
            return pd.DataFrame(columns=_LINEAGE_COLS)
        pdf = pd.DataFrame(rows)
        if "work_order" not in pdf.columns:  # pre-upgrade snapshots
            pdf["work_order"] = ""
        return pdf[_LINEAGE_COLS]

    def completed_tiles(self) -> set[int]:
        lin = self.lineage()
        if lin.empty:
            return set()
        done = lin[lin["status"].isin(["ok", "empty", "skipped"])]
        return set(done["tile_gid"].astype(int))

    def read(self, spark, snapshot_id: int | None = None):
        """Committed-snapshot view as a DataFrame (reads only committed
        files — uncommitted task output is invisible).  snapshot_id
        reads the table AS OF that commit (time travel)."""
        fs = self.files(snapshot_id)
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
