"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is never sampled with rand(): resumed/retried tasks
would draw different rows, and two pipelines could not agree on the
same subset.  The standard pattern is HASH sampling — a row is selected
iff hash(stable_key) falls under a threshold — which is reproducible
across runs, engines, partitionings, and cluster sizes, and composes
(a 1% sample of a 10% sample is the same rows every time).

The hash here is the first 15 hex digits of sha2-256 of the key (60
bits, uniform), mapped to a fraction in [0, 1) — pure JVM expression
(sha2 + substring + conv: whole-stage codegen, no Python, no lambda),
and exactly recomputable by an ANSI-SQL oracle from the same hex
digits.  A seed string is concatenated into the key so different
samples of the same table are independent.

The reference has no sampling operator (it processes every tile); this
module is part of the engine's training-data surface (brief: "the
operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_fraction_col", "hash_sample", "stratified_sample",
           "weighted_mixture"]

# 16^15 — the denominator for the 15-hex-digit uniform draw
_DENOM = 1 << 60


def hash_fraction_col(key: Column, seed: str = "") -> Column:
    """Uniform [0, 1) draw as a DOUBLE, derived deterministically from
    `key` (and `seed`): conv(substr(sha2(key||seed), 1, 15), 16, 10)
    / 16^15.  60 bits is exact in both bigint and float64."""
    h = F.sha2(F.concat(key.cast("string"), F.lit(seed)), 256)
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
        / F.lit(float(_DENOM))
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "url",
    seed: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash fraction is
    < `fraction`.  Same rows on every run/engine/cluster size; the
    filter is a map-only JVM predicate that pushes no shuffle."""
    return df.where(hash_fraction_col(F.col(key_col), seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "url",
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep-fractions (the
    training-mixture knob — e.g. keep 100% of rare languages, 5% of the
    dominant one).  Still map-only: the per-stratum threshold is a CASE
    expression over the broadcast-small `fractions` literal map."""
    thr = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(frac))
        ).otherwise(thr)
    return df.where(hash_fraction_col(F.col(key_col), seed) < thr)


def weighted_mixture(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "url",
    seed: str = "",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic fractional up/down-sampling — the training-mixture
    epoch knob (e.g. weight 'zh' 2.5x, 'en' 0.4x): every row appears
    floor(w) times plus one more iff its hash draw falls under frac(w),
    tagged with copy_id = 1..n.  Same hash-threshold determinism as
    hash_sample, so the materialized mixture is identical on every
    run/engine/cluster size.  Map-only: a CASE weight, one comparison,
    one sequence-explode — no shuffle, no Python."""
    w = F.lit(float(default_weight))
    for value, wt in sorted(weights.items()):
        w = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(wt))
        ).otherwise(w)
    base = F.floor(w).cast("bigint")
    extra = (hash_fraction_col(F.col(key_col), seed) < (w - base)).cast("bigint")
    return (
        df.withColumn("_n", base + extra)
        .where(F.col("_n") > 0)
        .withColumn(
            "copy_id",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("_n"))),
        )
        .drop("_n")
    )
