"""Iceberg-style table format over parquet: snapshots, manifests, lineage.

The reference's restart-relevant state is per-tile YAML configs plus a
completed/skipped bookkeeping dict (config.py:73-84, batch3dfierapp.py:
242-245); a re-run reprocesses everything.  Our engine upgrades that to
checkpointed resumability (north_rule): every per-tile work unit commits
atomically — data files plus ONE lineage row (tile_id, partition_id,
rows_in, rows_out, wall_ms, status) — into a snapshot log, and a new run
resumes by anti-joining the work list against completed tiles.

Layout (no Iceberg jar in this sandbox; same commit semantics):

    root/
      data/tile_gid=<gid>/<uuid>.parquet     # task-written data files
      metadata/
        snapshot-000001.json                 # {parent, files[], lineage[]}
        CURRENT                              # name of current snapshot

Commit = write snapshot-N.json (contains full file list = parent's plus
appended), then atomically `os.replace` the CURRENT pointer.  Readers
resolve CURRENT -> file list, so half-written runs are invisible.  On a
real cluster the same protocol runs against an object store / a real
Iceberg catalog — the interface is kept thin on purpose (SURVEY.md §7.0).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass

import pandas as pd

__all__ = ["LineageRow", "IcebergishTable"]


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

    # -- snapshot chain -----------------------------------------------------

    def _current_name(self) -> str | None:
        p = os.path.join(self.meta_dir, "CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip() or None

    def current_snapshot(self) -> dict | None:
        name = self._current_name()
        if name is None:
            return None
        with open(os.path.join(self.meta_dir, name)) as f:
            return json.load(f)

    def snapshot(self, snapshot_id: int) -> dict:
        """Load a specific snapshot by id (time travel — every commit's
        manifest is immutable, so any historical table state stays
        readable, like Iceberg's `VERSION AS OF`)."""
        p = os.path.join(self.meta_dir, f"snapshot-{snapshot_id:06d}.json")
        if not os.path.exists(p):
            raise ValueError(f"no snapshot {snapshot_id}")
        with open(p) as f:
            return json.load(f)

    def snapshots(self) -> list[int]:
        """All committed snapshot ids, ascending (the history log)."""
        out = []
        for n in os.listdir(self.meta_dir):
            if n.startswith("snapshot-") and n.endswith(".json"):
                out.append(int(n[len("snapshot-"):-len(".json")]))
        return sorted(out)

    def commit(self, new_files: list[str], lineage: list[LineageRow]) -> int:
        """Atomic append commit: new snapshot = parent files + new_files,
        parent lineage + new lineage."""
        cur = self.current_snapshot()
        sid = (cur["snapshot_id"] + 1) if cur else 1
        rows = []
        for r in lineage:
            r.snapshot_id = sid
            rows.append(asdict(r))
        snap = {
            "snapshot_id": sid,
            "parent": cur["snapshot_id"] if cur else None,
            "files": (cur["files"] if cur else []) + list(new_files),
            "lineage": (cur["lineage"] if cur else []) + rows,
        }
        name = f"snapshot-{sid:06d}.json"
        tmp = os.path.join(self.meta_dir, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, os.path.join(self.meta_dir, name))
        ptmp = os.path.join(self.meta_dir, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(ptmp, "w") as f:
            f.write(name)
        os.replace(ptmp, os.path.join(self.meta_dir, "CURRENT"))
        return sid

    # -- reads ----------------------------------------------------------------

    def files(self) -> list[str]:
        cur = self.current_snapshot()
        return cur["files"] if cur else []

    def lineage(self) -> pd.DataFrame:
        cur = self.current_snapshot()
        cols = ["tile_gid", "partition_id", "rows_in", "rows_out",
                "wall_ms", "status", "snapshot_id", "work_order"]
        if not cur or not cur["lineage"]:
            return pd.DataFrame(columns=cols)
        pdf = pd.DataFrame(cur["lineage"])
        if "work_order" not in pdf.columns:  # pre-upgrade snapshots
            pdf["work_order"] = ""
        return pdf[cols]

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
        if snapshot_id is None:
            fs = self.files()
        else:
            fs = self.snapshot(snapshot_id)["files"]
        if not fs:
            raise ValueError("empty table (no committed snapshot)")
        return spark.read.parquet(*fs)

    # -- task-side helpers ------------------------------------------------------

    def new_data_path(self, tile_gid: int) -> str:
        d = os.path.join(self.data_dir, f"tile_gid={tile_gid}")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{uuid.uuid4().hex}.parquet")
