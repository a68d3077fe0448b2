"""Gap-based sessionization of event streams (batch form).

A session is a maximal run of a user's events where consecutive gaps
are <= `gap`.  Classic two-window plan, all JVM:

  1. lag(ts) over (partition by user order by ts, event_id)
  2. is_start = gap exceeded (or first event)
  3. session_seq = running sum of is_start over the same window
  4. groupBy (user, session_seq) -> n_events, start, end, duration

One shuffle on user_id serves both windows and the final aggregation
(same partitioning expression), so Catalyst reuses the exchange.  At
100 TB skewed users are bounded: the window only carries (ts, event_id,
value) not payloads, and the state per user is one running counter.

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
) -> DataFrame:
    """Return one row per (user, session): session_seq (1-based per
    user in time order), n_events, first/last event time, duration in
    seconds, and the value sum (rounded for cross-engine parity)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    gap_s = gap_minutes * 60.0
    prev_ts = F.lag(ts_col).over(w)
    is_start = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = events.withColumn("_start", is_start).withColumn(
        "session_seq", F.sum("_start").over(w)
    )
    return (
        with_sess.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).alias("duration_s"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("session_seq").cast("bigint").alias("session_seq"),
            "n_events",
            "session_start",
            "session_end",
            "duration_s",
            "sum_value",
        )
    )
