"""Ratchet bench_runs/floors.json from recorded run files.

Floor = min over every recorded rep of every run file at the floors
protocol (sf + pages).  The min is contamination-robust — co-tenancy
only inflates a sample — so ratcheting DOWN is always sound; a floor
never moves up here (a deliberate query reshape that legitimately
slows a query gets its floor reset by hand with the reasoning in the
commit message, as q_dedup_exact/q_asof_join were in round 6).

Usage: python tools/update_floors.py [runs_dir]   (default bench_runs/r6)
Prints the changed floors; writes the file in place.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_ord(name: str) -> int:
    """Numeric run index from a bench_r*_runN.json filename (lexical
    order breaks at run10 vs run2)."""
    import re

    m = re.search(r"run(\d+)\.json$", name)
    return int(m.group(1)) if m else 0


def main() -> None:
    runs_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "bench_runs", "r6")
    floors_path = os.path.join(HERE, "bench_runs", "floors.json")
    with open(floors_path) as f:
        rec = json.load(f)
    proto = rec.get("protocol", {})
    floors = rec.setdefault("floors", {})
    # a hand-rebaselined (reshaped) query only ratchets from runs at or
    # after its pin — earlier run files carry the OLD implementation's
    # minima, which the new code cannot legitimately reach
    pins = rec.get("pinned_from_run", {})
    best: dict[str, float] = {}
    for n in sorted(os.listdir(runs_dir)):
        if not (n.startswith("bench_") and n.endswith(".json")):
            continue
        try:
            with open(os.path.join(runs_dir, n)) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if d.get("sf") != proto.get("sf") or d.get("pages") != proto.get("pages"):
            continue
        for q, arr in d.get("runs", {}).items():
            if q in pins and _run_ord(n) < _run_ord(pins[q]):
                continue
            m = min(arr)
            if q not in best or m < best[q]:
                best[q] = m
    changed = {}
    for q, m in sorted(best.items()):
        old = floors.get(q)
        if old is None or m < old:
            floors[q] = round(m, 3)
            changed[q] = {"old": old, "new": round(m, 3)}
    with open(floors_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps({"changed": changed, "n_floors": len(floors)}))


if __name__ == "__main__":
    main()
