"""Robust statistics: MAD-based outlier flagging.

The standard data-cleaning rule that survives skewed web data where
z-scores do not: a value is an outlier iff
|x - median| > k * MAD, with MAD = median(|x - median|) — both
medians computed per group.  Mean/stddev break on the heavy-tailed
value distributions (one bot user shifts the mean); the median/MAD
pair has a 50% breakdown point.

Determinism contract: medians are exact interpolating percentiles —
Spark `percentile(col, 0.5)` and DuckDB `QUANTILE_CONT(col, 0.5)`
implement the same law (average of the two middle order statistics
for even n; the percentile_heights contract query pins this parity) —
and every derived quantity is rounded to `round_to` decimals BEFORE
the next aggregation, so both engines feed identical values forward.

Scale shape: two partial-aggregating groupBys over the (small) key
space with the per-key medians broadcast back — the fact table never
shuffles.  Exact percentile buffers a group's values on one task; at
100 TB group sizes swap in `approx_percentile` exactly as
operators/heights.py documents for the same trade.

Reference analog: none (the reference delegates stats to Postgres);
this extends the engine's quality-filter family (textstats, quality,
lmscore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mad_outliers"]


def mad_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 5.0,
    round_to: int = 4,
) -> DataFrame:
    """(id, key, value, adev, is_outlier) — one row per input row with
    its rounded absolute deviation from the group median and the
    k*MAD outlier flag.  A group whose MAD is 0 (over half the values
    identical) flags every deviating value, the conventional rule."""
    med = df.groupBy(key_col).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), round_to)
        .alias("_med")
    )
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "_adev",
        F.round(F.abs(F.col(value_col) - F.col("_med")), round_to),
    )
    mad = dev.groupBy(key_col).agg(
        F.round(F.expr("percentile(_adev, 0.5)"), round_to)
        .alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), key_col)
        .select(
            F.col(id_col),
            F.col(key_col),
            F.col(value_col),
            F.col("_adev").alias("adev"),
            (F.col("_adev") > F.lit(k) * F.col("_mad"))
            .alias("is_outlier"),
        )
    )
