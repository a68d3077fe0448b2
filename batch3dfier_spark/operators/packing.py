"""Sequence packing: place every document into fixed-size training
sequences (the GPT-style pretraining layout — concatenate the corpus
shard-by-shard and cut every `n_ctx` tokens, letting documents span a
cut).  The packer does not materialize token arrays; it computes, per
document, WHERE its tokens land: (shard, seq_id, seq_off) plus whether
it spans a sequence boundary.  A writer can then group by (shard,
seq_id) to emit the actual token blocks.

Distribution/scale:
- the shard is `doc_id % n_shards` — uniform by construction, so the
  one window this operator needs (a running token-count sum per shard,
  ordered by doc_id) runs over same-sized groups; there is no hot key
  for the window to straggle on (the round-4 lesson: AQE cannot split
  window partitions, so windows are only allowed over keys whose group
  size is bounded by construction).  At 100 TB you raise n_shards so a
  shard is a few hundred MB of text; the packing inside each shard is
  embarrassingly parallel across shards.
- everything is a pure JVM expression (token_count's split + size, one
  windowed SUM) — whole-stage codegen, no Python.

Determinism: (shard, seq_id, seq_off) depend only on doc_id order and
token counts, so the layout is identical on every run, engine,
partitioning, and cluster size — and exactly reproducible by an
ANSI-SQL oracle (SUM OVER ... ROWS UNBOUNDED PRECEDING).

The reference has no packing analog (its unit of work is a tile); this
module is part of the engine's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import sql_token_count, token_count

__all__ = ["pack_sequences", "emit_sequences", "sql_pack_sequences",
           "sql_emit_sequences"]


def pack_sequences(
    df: DataFrame,
    n_ctx: int,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its place in the packed layout.

    Returns the input's id column plus:
      shard     — doc_id % n_shards (uniform; the packing unit)
      n_tokens  — whitespace token count of the document
      seq_id    — index (within the shard) of the n_ctx-token sequence
                  the document STARTS in
      seq_off   — token offset of the document inside that sequence
      spans     — true iff the document crosses into the next sequence
                  (its tail is cut there, exactly like GPT packing)
    """
    tok = token_count(F.col(text_col))
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("shard", shard)
        .withColumn("n_tokens", tok.cast("bigint"))
        .withColumn(
            "_cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .withColumn(
            "seq_id", F.floor(F.col("_cum_before") / F.lit(n_ctx)).cast("bigint")
        )
        .withColumn(
            "seq_off", F.pmod(F.col("_cum_before"), F.lit(n_ctx)).cast("bigint")
        )
        .withColumn(
            "spans",
            (F.col("seq_off") + F.col("n_tokens")) > F.lit(n_ctx),
        )
    )
    return out.select(
        id_col, "shard", "n_tokens", "seq_id", "seq_off", "spans"
    )


def emit_sequences(
    df: DataFrame,
    n_ctx: int,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The writer half of packing: materialize the actual training
    sequences — (shard, seq_id, seq_text, n_tokens) where seq_text is
    the space-joined run of exactly n_ctx tokens cut from the shard's
    doc_id-ordered concatenation (the final sequence of a shard may be
    shorter).  Documents spanning a cut are split across two rows,
    exactly as the layout from `pack_sequences` promises.

    Scale shape: the same uniform-shard window as pack_sequences, then
    one posexplode (one row per TOKEN — this is the step that
    materializes the corpus, unavoidable for a writer) and a groupBy
    (shard, seq_id) whose groups are exactly n_ctx rows — bounded by
    construction, no skew possible.  collect_list here is legitimate:
    each group is one training sequence, n_ctx tokens, the unit the
    writer must hold anyway.  Everything JVM-side."""
    tok_arr = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = (
        df.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
            F.when(
                F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(tok_arr).alias("_toks"),
        )
        .withColumn(
            "_cum_before",
            F.coalesce(F.sum(F.size("_toks")).over(w), F.lit(0)),
        )
    )
    pos = toks.select(
        "shard",
        "_cum_before",
        F.posexplode("_toks").alias("_p", "_tok"),
    ).select(
        "shard",
        (F.col("_cum_before") + F.col("_p")).alias("_idx"),
        "_tok",
    )
    return (
        pos.groupBy(
            "shard",
            F.floor(F.col("_idx") / F.lit(n_ctx)).cast("bigint").alias("seq_id"),
        )
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("_idx", "_tok"))).getField(
                    "_tok"
                ),
                " ",
            ).alias("seq_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
    )


def sql_pack_sequences(
    n_ctx: int,
    n_shards: int,
    text: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of pack_sequences over `table(doc_id, {text})`."""
    return f"""
SELECT doc_id, shard, n_tokens,
       CAST(FLOOR(cum_before / {n_ctx}) AS BIGINT) AS seq_id,
       CAST(cum_before % {n_ctx} AS BIGINT) AS seq_off,
       (cum_before % {n_ctx}) + n_tokens > {n_ctx} AS spans
FROM (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM (
    SELECT doc_id, CAST(doc_id % {n_shards} AS INT) AS shard,
           {sql_token_count(text)} AS n_tokens
    FROM {table}))
"""


def sql_emit_sequences(
    n_ctx: int,
    n_shards: int,
    text: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of emit_sequences: same shard window, UNNEST-RANGE
    token positions, STRING_AGG ORDER BY global index."""
    t = f"TRIM(COALESCE({text}, ''))"
    return f"""
WITH toks AS (
  SELECT doc_id, CAST(doc_id % {n_shards} AS INT) AS shard,
         CASE WHEN LENGTH({t}) = 0 THEN CAST([] AS VARCHAR[])
              ELSE REGEXP_SPLIT_TO_ARRAY({t}, '\\s+') END AS tk
  FROM {table}
),
cum AS (
  SELECT shard, tk,
         COALESCE(SUM(LEN(tk)) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM toks
),
pos AS (
  SELECT shard, cb + u.i - 1 AS idx, tk[u.i] AS tok
  FROM cum, UNNEST(RANGE(1, LEN(tk) + 1)) AS u(i)
)
SELECT shard, CAST(idx // {n_ctx} AS BIGINT) AS seq_id,
       STRING_AGG(tok, ' ' ORDER BY idx) AS seq_text,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM pos
GROUP BY shard, seq_id
"""
