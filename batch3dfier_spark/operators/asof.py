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
size is bounded or uniform): the group here is all left+right rows of
ONE join key.  For per-user/per-instrument streams that is bounded by
per-entity activity.  A genuinely hot key (one instrument = half the
corpus) needs range-bucketing the window by (key, ts_bucket) and
carrying the last right row across bucket boundaries — out of scope
until an operator here has such a key; every key this engine joins on
(user_id, tile_gid) is bounded by construction.

Determinism: ties are resolved by the total order (ts, side,
right-id): at equal ts a right row sorts BEFORE the left row
(inclusive as-of, pandas merge_asof's allow_exact_matches=True), and
among right rows at one ts the largest right-id wins.  The oracle
(`sql_as_of_join`) replays the identical union + LAST_VALUE IGNORE
NULLS window, with the identical COALESCE'd sort keys, so NULL
ordering differences between engines (Spark NULLS FIRST asc, DuckDB
NULLS LAST) never arise.

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
) -> DataFrame:
    """Left as-of join: every `left` row, plus `right_cols` (and the
    right id + ts) of the latest right row with the same `on` key and
    right ts <= left ts — or NULLs if none (or none within
    `tolerance_s` seconds).

    `right_cols` defaults to every right column except the key, ts,
    and id columns.  Matched columns are suffixed with `suffix`.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (on, ts_col, right_id_col)
        ]
    carried = [right_id_col, ts_col, *right_cols]

    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_id_col).cast("bigint").alias("_rid"),
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
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(lft)
    for c in carried:
        u = u.withColumn(
            f"_m_{c}", F.last(F.col(f"_c_{c}"), ignorenulls=True).over(w)
        )
    out = u.where(F.col("_side") == 1)
    if tolerance_s is not None:
        # cast both operands to TIMESTAMP symmetrically (parquet event
        # times are TIMESTAMP_NTZ, which unix_micros rejects); any
        # session-timezone offset the cast introduces cancels in the
        # difference
        stale = (
            F.col(f"_m_{ts_col}").isNull()
            | (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(F.col(f"_m_{ts_col}").cast("timestamp"))
                > int(tolerance_s * 1_000_000)
            )
        )
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
    NULLS window with the identical (ts, side, COALESCE(rid,-1)) order,
    over subqueries `left_sql` / `right_sql`."""
    right_cols = right_cols or []
    carried = [right_id_col, ts_col, *right_cols]
    r_sel = ", ".join(
        [on, ts_col, "0 AS _side",
         f"CAST({right_id_col} AS BIGINT) AS _rid"]
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
            f"(_m_{ts_col} IS NULL OR "
            f"EPOCH_US({ts_col}) - EPOCH_US(_m_{ts_col}) > {tol_us})"
        )
        final = ", ".join(
            [f"_l_{c} AS {c}" for c in left_cols]
            + [
                f"CASE WHEN {stale} THEN NULL ELSE _m_{c} END AS {c}{suffix}"
                for c in carried
            ]
        )
    else:
        final = ", ".join(
            [f"_l_{c} AS {c}" for c in left_cols]
            + [f"_m_{c} AS {c}{suffix}" for c in carried]
        )
    return f"""
WITH u AS (
  SELECT {r_sel} FROM ({right_sql})
  UNION ALL
  SELECT {l_sel} FROM ({left_sql})
),
m AS (
  SELECT u.*, {m_sel} FROM u
)
SELECT {final} FROM m WHERE _side = 1
"""
