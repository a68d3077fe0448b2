"""Gap-based sessionization of event streams (batch form).

A session is a maximal run of a user's events where consecutive gaps
are <= `gap`.  Classic two-window plan, all JVM:

  1. lag(ts) over (partition by user order by ts, event_id)
  2. is_start = gap exceeded (or first event)
  3. session_seq = running sum of is_start over the same window
  4. groupBy (user, session_seq) -> n_events, start, end, duration

One shuffle on user_id serves both windows and the final aggregation
(same partitioning expression), so Catalyst reuses the exchange.  The
single-window plan still holds EVERY event of a user in one window
partition — a bot user pins a task, and AQE cannot split window
partitions; `ts_bucket_s` selects the hot-key-safe two-pass variant
(per-(user, bucket) islands + a bounded per-user summary re-island —
the asof.as_of_join bucketed-carry design), which is row-identical
and runs against the same oracle.

The streaming twin is streaming/events.user_running_totals (state-store
based); this batch form is the oracle-checkable one (SQL twin in
plans/queries.SQL_SESSIONIZE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
    ts_bucket_s: int | None = None,
) -> DataFrame:
    """Return one row per (user, session): session_seq (1-based per
    user in time order), n_events, first/last event time, duration in
    seconds, and the value sum (rounded for cross-engine parity).

    `ts_bucket_s` selects the HOT-KEY-SAFE two-pass path (the same
    design as asof.as_of_join's bucketed carry): pass 1 runs the
    gaps-and-islands windows per (user, time bucket) — a bot user's
    1e9 events spread over its buckets instead of pinning one task —
    and pass 2 re-islands the per-bucket SESSION SUMMARIES per user.
    The second window is bounded by construction: a bucket holds at
    most bucket_s/gap + 1 sessions (sessions are separated by > gap of
    silence), so a year of day-buckets is <= ~18k summary rows per
    user regardless of event count.

    Exactness: a maximal global session's in-bucket fragments are
    consecutive summaries whose boundary gap (prev end -> next start)
    is <= gap — the chain's own linking gap — so pass 2 merges exactly
    the fragments of one global session and never bridges two (whose
    gap is > gap by definition).  Fragment starts are event
    timestamps, distinct across buckets, so the summary order is
    total and the reconstruction deterministic; the bucketed result
    is row-identical to the single-window plan and runs against the
    SAME SQL oracle."""
    gap_s = gap_minutes * 60.0

    def _islands(df: DataFrame, part_cols: list) -> DataFrame:
        w = Window.partitionBy(*part_cols).orderBy(
            F.col(ts_col).asc(), F.col(order_tiebreak).asc()
        )
        prev_ts = F.lag(ts_col).over(w)
        is_start = F.when(
            prev_ts.isNull()
            | (F.unix_timestamp(F.col(ts_col))
               - F.unix_timestamp(prev_ts) > gap_s),
            F.lit(1),
        ).otherwise(F.lit(0))
        return df.withColumn("_start", is_start).withColumn(
            "_seq", F.sum("_start").over(w)
        )

    if ts_bucket_s is None:
        grouped = _islands(events, [user_col]).groupBy(user_col, "_seq")
        return (
            grouped.agg(
                F.count(F.lit(1)).alias("n_events"),
                F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss")
                .alias("session_start"),
                F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss")
                .alias("session_end"),
                (F.unix_timestamp(F.max(ts_col))
                 - F.unix_timestamp(F.min(ts_col))).alias("duration_s"),
                F.round(F.sum(value_col), 4).alias("sum_value"),
            )
            .select(
                user_col,
                F.col("_seq").cast("bigint").alias("session_seq"),
                "n_events", "session_start", "session_end",
                "duration_s", "sum_value",
            )
        )

    # pass 1: islands per (user, bucket); summaries carry RAW min/max
    # ts and UNROUNDED value partials (rounding happens once, at the
    # end, exactly like the single-window plan)
    bucketed = events.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / ts_bucket_s)
    )
    loc = (
        _islands(bucketed, [user_col, "_b"])
        .groupBy(user_col, "_b", "_seq")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(ts_col).alias("_s"),
            F.max(ts_col).alias("_e"),
            F.sum(value_col).alias("_sv"),
        )
    )
    # pass 2: re-island the bounded summaries per user
    w2 = Window.partitionBy(user_col).orderBy(F.col("_s").asc())
    prev_e = F.lag("_e").over(w2)
    is_start2 = F.when(
        prev_e.isNull()
        | (F.unix_timestamp(F.col("_s"))
           - F.unix_timestamp(prev_e) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    merged = loc.withColumn("_start2", is_start2).withColumn(
        "_seq2", F.sum("_start2").over(w2)
    )
    return (
        merged.groupBy(user_col, "_seq2")
        .agg(
            F.sum("_n").alias("n_events"),
            F.date_format(F.min("_s"), "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            F.date_format(F.max("_e"), "yyyy-MM-dd HH:mm:ss")
            .alias("session_end"),
            (F.unix_timestamp(F.max("_e"))
             - F.unix_timestamp(F.min("_s"))).alias("duration_s"),
            F.round(F.sum("_sv"), 4).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("_seq2").cast("bigint").alias("session_seq"),
            "n_events", "session_start", "session_end",
            "duration_s", "sum_value",
        )
    )
