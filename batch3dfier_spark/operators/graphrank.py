"""Link-graph ranking — integer-quantized PageRank over an edge list.

Web-corpus curation ranks hosts/pages by link authority (Common
Crawl's own host-level harmonic-centrality releases are the canonical
example) and uses the score as a quality prior for sampling, exactly
like this engine's other per-doc quality signals (textstats, bm25,
target_affinity).  This module supplies the iterative operator.

Quantization variant (documented, deterministic — the same move as
bm25's ln-free idf and affinity's ppm difference): ranks live as
exact integers in parts-per-billion of total mass.

    r_0(v)     = Q div N                      (Q = 1e9)
    r_{i+1}(v) = ((Q div N) * (100 - A)) div 100
               + (A * sum_{(u,v) in E} (r_i(u) div outdeg(u))) div 100

with A = 85 (the classic 0.85 damping as an integer percentage).
Every step is a bigint trunc-div both engines define identically, so
Spark and DuckDB agree bit-for-bit.  Two documented departures from
textbook PageRank, chosen for cross-engine exactness (not accuracy
bugs):

- truncation: each div drops a sub-ppb remainder, so total mass decays
  by < N ppb per iteration — ranking order is unaffected at any
  realistic N.
- dangling nodes (outdeg 0) do NOT redistribute their mass (the
  "dangling mass dropped" variant); a node with no in-links holds
  exactly the teleport term.

Scale shapes (100 TB / 1e9-node host graphs):
- the edge list is deduplicated with a groupBy (hash partial-agg
  absorbs hot pairs map-side), outdeg is one more groupBy(src).
- each iteration is ONE equi-join (ranks ⋈ edges on src — a hot hub's
  fan-out is a skewed join key, which AQE splits at runtime) and ONE
  groupBy(dst) sum (a hot authority is a skewed AGG key — absorbed by
  map-side partial aggregation; never a window).
- N and the teleport term travel as a broadcast one-row aggregate; no
  scalar ever visits the driver.
- lineage is truncated with localCheckpoint every iteration (same
  discipline as dedup.cluster_near_dups), so the plan does not grow
  O(iters) and a 50-iteration production run replans nothing.
- at cluster scale the edge table would be bucketed by src so the
  per-iteration join is co-located; on this sandbox the AQE path
  stands in.

Reference analog: none (the reference has no graph surface); this sits
with the corpus-analysis layer (vocab_topk, target_affinity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "sql_pagerank"]

_Q = 1_000_000_000  # rank mass quantum: parts-per-billion


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """(node, rank_q) after `iters` quantized PageRank steps over the
    (deduplicated) directed edge list.  `rank_q` is bigint ppb mass.
    Nodes are the union of both endpoint sets; parallel edges count
    once.  `checkpoint=False` keeps the plan lazy/unmaterialized for
    oracle runs and tests that want one analyzable DAG."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be an integer percentage")
    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
    ).distinct()  # hash-agg dedup, partial combine absorbs hot pairs
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = e.join(outdeg, "src")  # (src, dst, deg)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    # N (and the derived teleport term) as a broadcast one-row agg —
    # the same no-driver-scalar pattern as affinity's corpus totals
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    base = F.expr(f"{_Q} div _n")
    tele = F.expr(f"(({_Q} div _n) * {100 - damping_pct}) div 100")
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", base.cast("bigint").alias("rank_q"), "_n"
    )
    for _ in range(iters):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst"),
                F.expr("rank_q div deg").cast("bigint").alias("_c"),
            )
            .groupBy("dst")
            .agg(F.sum("_c").cast("bigint").alias("_s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    tele
                    + F.expr(
                        f"({damping_pct} * coalesce(_s, 0)) div 100"
                    )
                ).cast("bigint").alias("rank_q"),
                "_n",
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank_q")


def sql_pagerank(
    edges_sql: str,
    iters: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: `edges_sql` is a SELECT yielding (src, dst);
    iterations unroll into chained CTEs r0..r{iters} computing the
    identical integer recurrence."""
    a, t = damping_pct, 100 - damping_pct
    parts = [
        f"""
WITH e0 AS ({edges_sql}),
e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,
                      CAST(dst AS BIGINT) AS dst FROM e0),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, CAST({_Q} // n AS BIGINT) AS rank_q
       FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(iters):
        parts.append(f""",
c{i} AS (SELECT e.dst, CAST(SUM(r.rank_q // deg.deg) AS BIGINT) AS s
         FROM r{i} r JOIN e ON e.src = r.node
         JOIN deg ON deg.src = e.src
         GROUP BY e.dst),
r{i + 1} AS (SELECT nodes.node,
         CAST((({_Q} // n) * {t}) // 100
              + ({a} * COALESCE(c{i}.s, 0)) // 100 AS BIGINT) AS rank_q
         FROM nodes CROSS JOIN nn
         LEFT JOIN c{i} ON c{i}.dst = nodes.node)""")
    parts.append(f"""
SELECT node, rank_q FROM r{iters}""")
    return "".join(parts)
