"""JSONL (newline-delimited JSON) source + sink — the interchange
format every web-text corpus actually ships in (Common Crawl
derivatives, C4/RedPajama/Dolma dumps, eval sets), beside the parquet
tables the engine computes on.

Design rules for 100 TB ingest:

- **Explicit schema, never inference.**  `spark.read.json` without a
  schema runs a FULL extra pass over the data to infer one; at corpus
  scale that doubles ingest cost and a single malformed row can flip
  a column to string.  `read_jsonl` therefore requires a schema (the
  `DOCUMENTS_SCHEMA` default matches the documents table) and runs in
  PERMISSIVE mode with a `_corrupt_record` column so malformed lines
  are quarantined as rows, not exceptions — the standard
  dirty-web-data posture.
- **Compression is a split-ability decision.**  gzip members are not
  splittable: one 10 GB .json.gz becomes ONE task regardless of
  cluster size.  `write_jsonl` defaults to gzip for interchange
  (universal tooling) but callers shard via `n_shards` so file count,
  not file size, bounds parallelism — the writer repartitions by a
  uniform doc_id hash so shards are even and the layout deterministic.
- The reader is the same `spark.readStream.schema(...).json(...)`
  surface for streaming ingest (schema mandatory there anyway).

Reference analog: S7/S8 (CSV loader/export, `bag3d.py:63-138`) — this
is the web-corpus equivalent of that interchange pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["DOCUMENTS_SCHEMA", "read_jsonl", "write_jsonl"]

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    compression: str | None = "gzip",
    shard_key: str = "doc_id",
) -> None:
    """Write `df` as sharded JSONL.  Shards are assigned by a uniform
    hash of `shard_key` (deterministic layout, no hot shard); with a
    non-splittable codec the shard count IS the read parallelism, so
    size n_shards ~ total_bytes / 256 MB at scale."""
    out = df.repartition(n_shards, F.xxhash64(F.col(shard_key)))
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-first JSONL reader.  With `keep_corrupt` malformed lines
    land in `_corrupt_record` (PERMISSIVE mode) for a quarantine sink;
    without it the read runs DROPMALFORMED — same kept rows, but no
    corrupt column in the plan, so downstream column pruning (and a
    bare count(), which references zero data columns) stays legal:
    Spark forbids queries whose referenced set is ONLY the corrupt
    record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which a
    PERMISSIVE-filter-then-drop shape trips as soon as the optimizer
    prunes."""
    if keep_corrupt:
        full = schema + ", _corrupt_record string"
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    return (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
