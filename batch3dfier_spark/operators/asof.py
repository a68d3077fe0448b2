"""As-of join: attach to every left row the single most recent right
row (same key, right.ts <= left.ts) — the temporal join Spark's
DataFrame API lacks (pandas has merge_asof; DuckDB has ASOF JOIN).
Classic uses: trade→latest-quote, purchase→last-touch attribution,
event→latest-config.

Spark-first shape — the union-and-window trick, NOT a range join:
tag right rows side=0 and left rows side=1, union them, and take
`last(right_attr, ignorenulls=True)` over a window partitioned by the
key and ordered by (ts, side, right_id) up to the current row.  One
shuffle (the window partition), no pair materialization, no inequality
join for the optimizer to turn into a broadcast-nested-loop.  Compare
the naive formulation — `left JOIN right ON key AND r.ts <= l.ts` then
a max-per-left-row reduction — which materializes |left|x|right|
pairs per key before reducing.

Window-partition discipline (the round-4 rule: AQE cannot split a
window partition, so windows are only allowed over keys whose group
size is bounded or uniform): the plain shape's group is all
left+right rows of ONE join key, fine for per-user/per-instrument
streams where per-entity activity is bounded.  For a genuinely hot
key (one instrument carrying 10% of a 100 TB feed) pass
`ts_bucket_s`: the two-pass TIME-BUCKETED path
  1. windows only within (key, floor(ts / bucket)) groups — group
     size is bounded by per-bucket activity, a policy knob, never by
     total key volume;
  2. reduces each bucket to one summary row per carried column via
     groupBy + max(struct(ts, rid, value)) — PARTIAL map-side
     combine absorbs the hot key before the shuffle;
  3. prefix-carries the latest right values across buckets with a
     per-key window over the SMALL summary table (rows = keys x
     buckets, independent of input volume);
  4. joins the carry back on (key, bucket) — an equi-join AQE can
     skew-split — and coalesces in-bucket results over it.
Both paths produce bit-identical results; `ts_bucket_s` only changes
the physical plan.

Determinism: ties are resolved by the total order (ts, side,
right-id): at equal ts a right row sorts BEFORE the left row
(inclusive as-of, pandas merge_asof's allow_exact_matches=True), and
among right rows at one ts the largest right-id wins.  NULL handling
is pinned explicitly so Spark (NULLS FIRST asc) and DuckDB (NULLS
LAST) can never diverge: a NULL right id sorts as -2 (before every
left sentinel -1 and every real id), a right row with NULL ts is
DROPPED in both engines (an unknown-time state can never be "the
latest state at or before t"), and a left row with NULL ts gets NULL
matches in both.  The oracle (`sql_as_of_join`) replays the identical
union + LAST_VALUE IGNORE NULLS window with the identical pinned
order.

Reference analog: none (the reference joins on equality keys only —
SURVEY §2.4); this is part of the engine's training-data/stream
surface, where "latest state at event time" joins are routine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_of_join", "sql_as_of_join"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_id_col: str = "event_id",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
    ts_bucket_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row, plus `right_cols` (and the
    right id + ts) of the latest right row with the same `on` key and
    right ts <= left ts — or NULLs if none (or none within
    `tolerance_s` seconds).

    `right_cols` defaults to every right column except the key, ts,
    and id columns.  Matched columns are suffixed with `suffix`.

    `ts_bucket_s` (seconds) selects the hot-key-safe two-pass path:
    windows run only within (key, time-bucket) groups and the latest
    right state is prefix-carried across buckets via a per-key window
    over the small bucket-summary table (see module docstring).  Size
    it so one key's activity within a bucket fits a task comfortably
    (e.g. 3600 for a feed with <=1e6 rows/key/hour).  Results are
    identical to the default single-window path.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, ts_col, right_id_col)
        ]
    carried = [right_id_col, ts_col, *right_cols]

    r = right.where(F.col(ts_col).isNotNull()).select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.coalesce(
            F.col(right_id_col).cast("bigint"), F.lit(-2).cast("bigint")
        ).alias("_rid"),
        *[F.col(c).alias(f"_c_{c}") for c in carried],
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}")
          for t in left.schema.fields],
    )
    lft = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(-1).cast("bigint").alias("_rid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_c_{c}")
          for c in carried],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    if ts_bucket_s is None:
        w = (
            Window.partitionBy(on)
            .orderBy(
                F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rid").asc()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = r.unionByName(lft)
        for c in carried:
            u = u.withColumn(
                f"_m_{c}", F.last(F.col(f"_c_{c}"), ignorenulls=True).over(w)
            )
    else:
        bucket_us = int(ts_bucket_s * 1_000_000)
        # cast to TIMESTAMP symmetrically (parquet event times are
        # TIMESTAMP_NTZ, which unix_micros rejects); a session-timezone
        # offset only shifts every bucket boundary by the same amount
        bkt = F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(bucket_us)
        ).alias("_bkt")
        r = r.select("*", bkt)
        lft = lft.select("*", bkt)
        u = r.unionByName(lft)

        # pass 1: per-bucket last-right-state, one summary row per
        # (key, bucket, column) via partial-aggregating struct-max —
        # the hot key collapses map-side, nothing windows over it
        summ = r.groupBy(on, "_bkt").agg(
            *[
                F.max(
                    F.when(
                        F.col(f"_c_{c}").isNotNull(),
                        F.struct(
                            F.col(ts_col).alias("_t"),
                            F.col("_rid").alias("_r"),
                            F.col(f"_c_{c}").alias("_v"),
                        ),
                    )
                ).alias(f"_s_{c}")
                for c in carried
            ]
        )
        # pass 2: prefix carry over the bucket grid (every bucket that
        # holds ANY row, so empty-of-right buckets inherit too); the
        # window partitions by key but runs over the summary table
        # whose per-key row count is the bucket count, not the volume
        grid = u.select(on, "_bkt").distinct()
        wc = (
            Window.partitionBy(on)
            .orderBy(F.col("_bkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = grid.join(summ, [on, "_bkt"], "left").select(
            F.col(on).alias(f"_k_{on}"),
            F.col("_bkt").alias("_kbkt"),
            *[
                F.last(F.col(f"_s_{c}"), ignorenulls=True)
                .over(wc)["_v"]
                .alias(f"_p_{c}")
                for c in carried
            ],
        )
        # pass 3: in-bucket window + carried fallback; the join is a
        # plain equi-join (skew-splittable), left join so NULL-bucket
        # (NULL left ts) rows survive
        wb = (
            Window.partitionBy(on, "_bkt")
            .orderBy(
                F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rid").asc()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.join(
            carry,
            (F.col(on) == F.col(f"_k_{on}")) & (F.col("_bkt") == F.col("_kbkt")),
            "left",
        )
        for c in carried:
            u = u.withColumn(
                f"_m_{c}",
                F.coalesce(
                    F.last(F.col(f"_c_{c}"), ignorenulls=True).over(wb),
                    F.col(f"_p_{c}"),
                ),
            )

    out = u.where(F.col("_side") == 1)
    # a left row with NULL ts has no defined "as of" instant: NULL
    # matches in both engines (Spark's NULLS FIRST would otherwise
    # yield NULL by accident while DuckDB's NULLS LAST picked the
    # final state — pin it explicitly)
    null_ts = F.col(ts_col).isNull()
    if tolerance_s is not None:
        stale = null_ts | (
            F.col(f"_m_{ts_col}").isNull()
            | (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(F.col(f"_m_{ts_col}").cast("timestamp"))
                > int(tolerance_s * 1_000_000)
            )
        )
    else:
        stale = null_ts
    for c in carried:
        out = out.withColumn(
            f"_m_{c}",
            F.when(stale, F.lit(None)).otherwise(F.col(f"_m_{c}")),
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in carried],
    )


def sql_as_of_join(
    left_sql: str,
    right_sql: str,
    on: str,
    left_cols: list[str],
    ts_col: str = "ts",
    right_id_col: str = "event_id",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
) -> str:
    """DuckDB twin of as_of_join: identical union + LAST_VALUE IGNORE
    NULLS window with the identical pinned (ts, side, rid) order —
    NULL right ids coalesced to -2, NULL-ts right rows dropped, NULL-ts
    left rows forced to NULL matches — over subqueries `left_sql` /
    `right_sql`."""
    right_cols = right_cols or []
    carried = [right_id_col, ts_col, *right_cols]
    r_sel = ", ".join(
        [on, ts_col, "0 AS _side",
         f"COALESCE(CAST({right_id_col} AS BIGINT), -2) AS _rid"]
        + [f"{c} AS _c_{c}" for c in carried]
        + [f"NULL AS _l_{c}" for c in left_cols]
    )
    l_sel = ", ".join(
        [on, ts_col, "1 AS _side", "CAST(-1 AS BIGINT) AS _rid"]
        + [f"NULL AS _c_{c}" for c in carried]
        + [f"{c} AS _l_{c}" for c in left_cols]
    )
    win = (
        f"OVER (PARTITION BY {on} ORDER BY {ts_col} ASC, _side ASC, _rid ASC "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    m_sel = ", ".join(
        f"LAST_VALUE(_c_{c} IGNORE NULLS) {win} AS _m_{c}" for c in carried
    )
    if tolerance_s is not None:
        tol_us = int(tolerance_s * 1_000_000)
        stale = (
            f"({ts_col} IS NULL OR _m_{ts_col} IS NULL OR "
            f"EPOCH_US({ts_col}) - EPOCH_US(_m_{ts_col}) > {tol_us})"
        )
    else:
        stale = f"({ts_col} IS NULL)"
    final = ", ".join(
        [f"_l_{c} AS {c}" for c in left_cols]
        + [
            f"CASE WHEN {stale} THEN NULL ELSE _m_{c} END AS {c}{suffix}"
            for c in carried
        ]
    )
    return f"""
WITH u AS (
  SELECT {r_sel} FROM ({right_sql}) WHERE {ts_col} IS NOT NULL
  UNION ALL
  SELECT {l_sel} FROM ({left_sql})
),
m AS (
  SELECT u.*, {m_sel} FROM u
)
SELECT {final} FROM m WHERE _side = 1
"""
