"""Render the per-query r6-vs-r7 table for OPTIMIZATION_r07.md.

Usage: python tools/perf_table.py <r7_run.json>
"""

import json
import sys

d = json.load(open(sys.argv[1]))
q = d["queries"]
r6 = json.load(open("BENCH_r06.json"))["parsed"]["queries"]

TOUCHED = {
    "q_bm25_topk": "kernel rewrite (#1)",
    "q_hybrid_rrf": "#1 + dense-side (#6)",
    "q_near_dedup_incremental": "vectorized screens (#3), sig kernel (#4), idempotent register (#9)",
    "q_dedup_incremental": "idempotent register (#9)",
    "q_dedup_minhash": "sig kernel (#4), AQE broadcast 64m (#8)",
    "q_dedup_simhash": "verify-before-distinct (#5)",
    "q_dedup_clusters": "CC: no edge distinct, bcast labels, lazy ckpt, seeded init (#5)",
    "q_cluster_survivors": "same CC path (#5)",
    "q_dedup_embedding": "adaptive _ensure_parallel (#6)",
    "q_ann_cosine": "parallel scan + tiled kernel (#6)",
    "q_ann_lsh": "parallel scan (#6)",
    "q_ann_ivf": "parallel scan (#6)",
    "q_events_enrich_stream": "parquet sink (#7)",
    "q_events_dedup_stream": "parquet sink (#7)",
    "q_events_attrib_stream": "parquet sink (#7)",
    "q_dup_spans": "persisted position pass (#5)",
    "q_semdedup": "sig/screen kernels shared (#4)",
}

rows = sorted(q, key=lambda k: -r6.get(k, 0))
print("| query | r6 (driver, sf1.0) | r7 (this host, sf1.0) | change | what |")
print("|---|---|---|---|---|")
for k in rows:
    if k not in r6:
        continue
    a, b = r6[k], q[k]
    note = TOUCHED.get(k, "untouched")
    ratio = f"{a/b:.1f}x faster" if b < a * 0.8 else (
        f"{b/a:.1f}x slower" if b > a * 1.25 else "~flat")
    print(f"| {k} | {a:.2f} | {b:.2f} | {ratio} | {note} |")
