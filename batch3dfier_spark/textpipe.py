"""Composable training-data pipeline over a documents table.

The tiling app (app.py) is the reference-parity surface; this module is
the engine's training-data surface: a YAML-declared chain of the
operators a web-scale corpus pipeline needs — exact dedup, quality /
repetition filtering, deterministic sampling, mixture weighting,
benchmark decontamination — folded over one DataFrame and written out
with per-step row accounting.

Every step is one of the oracle-checked operators from operators/
(dedup.py, sampling.py, textstats.py), so a pipeline's semantics are
exactly the semantics the driver contract verifies; the pipeline layer
adds only composition, config parsing, and the report.  All steps are
deterministic (hash-threshold draws, fixed-constant signatures), so a
rerun — or a resumed run on a cluster — materializes byte-identical
output.

Config shape::

    input:
      documents: /path/documents.parquet
    output:
      path: /path/out_parquet
    steps:
      - op: exact_dedup                  # drop byte-identical dups
      - op: quality_filter               # textstats/repetition gates
        min_tokens: 10
        max_dup_line_frac: 0.3
        max_top_bigram_frac: 0.2
      - op: near_dedup                   # minhash/simhash clusters,
        method: minhash                  #   keep the min-id doc per
        threshold: 0.5                   #   connected component
      - op: decontaminate                # drop docs overlapping an
        benchmark: /path/eval.parquet    #   eval corpus (word n-grams)
        ngram: 4
      - op: hash_sample
        fraction: 0.5
        seed: s1
      - op: stratified_sample
        fractions: {en: 0.1}
        default_fraction: 1.0
        seed: s2
      - op: mixture
        weights: {zh: 2.5}
        seed: m1
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["run_textpipe", "parse_textpipe_config"]


def parse_textpipe_config(path: str) -> dict:
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if "input" not in cfg or "documents" not in cfg["input"]:
        raise ValueError("config needs input.documents")
    if "output" not in cfg or "path" not in cfg["output"]:
        raise ValueError("config needs output.path")
    for step in cfg.get("steps", []):
        if "op" not in step:
            raise ValueError(f"step missing op: {step}")
    return cfg


def _apply_step(spark: SparkSession, df: DataFrame, step: dict) -> DataFrame:
    op = step["op"]
    if op == "exact_dedup":
        from .operators.dedup import exact_dedup

        keep = (
            exact_dedup(df, text_col=step.get("text_col", "text"))
            .where(~F.col("is_dup"))
            .select("doc_id")
        )
        return df.join(keep, "doc_id")
    if op == "quality_filter":
        from .operators.textstats import repetition_stats, token_count

        out = df
        if "min_tokens" in step or "max_tokens" in step:
            out = out.withColumn("_nt", token_count(F.col("text")))
            if "min_tokens" in step:
                out = out.where(F.col("_nt") >= int(step["min_tokens"]))
            if "max_tokens" in step:
                out = out.where(F.col("_nt") <= int(step["max_tokens"]))
            out = out.drop("_nt")
        rep_gates = {
            k: step[k]
            for k in ("max_dup_line_frac", "max_dup_line_char_frac",
                      "max_top_bigram_frac")
            if k in step
        }
        if rep_gates:
            rep = repetition_stats(out)
            cond = F.lit(True)
            for k, v in rep_gates.items():
                cond = cond & (F.col(k[len("max_"):]) <= float(v))
            keep = rep.where(cond).select("doc_id")
            out = out.join(keep, "doc_id")
        return out
    if op == "near_dedup":
        from .operators.dedup import (
            connected_components,
            minhash_near_dups,
            simhash_near_dups,
        )

        method = step.get("method", "minhash")
        if method == "minhash":
            # persist_intermediates=False: the pipeline holds the frame
            # across later steps and the final write, so funnel-internal
            # persists would outlive their usefulness in the executor
            # cache; the small recompute is cheaper than the leak
            pairs = minhash_near_dups(
                df, threshold=float(step.get("threshold", 0.5)),
                persist_intermediates=False,
            )
        elif method == "simhash":
            pairs = simhash_near_dups(
                df, max_hamming=int(step.get("max_hamming", 8))
            )
        else:
            raise ValueError(f"near_dedup method must be minhash|simhash,"
                             f" got {method}")
        comp = connected_components(pairs)
        # keeper = the doc whose id IS the component label; docs never
        # paired keep themselves by absence from the drop list
        drops = comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        return df.join(drops, "doc_id", "left_anti")
    if op == "decontaminate":
        from .operators.dedup import decontaminate

        bench = spark.read.parquet(step["benchmark"])
        flagged = decontaminate(
            df, bench, n=int(step.get("ngram", 4))
        ).select("doc_id")
        return df.join(flagged, "doc_id", "left_anti")
    if op == "hash_sample":
        from .operators.sampling import hash_sample

        return hash_sample(
            df, float(step["fraction"]),
            key_col=step.get("key_col", "doc_id"),
            seed=str(step.get("seed", "")),
        )
    if op == "stratified_sample":
        from .operators.sampling import stratified_sample

        return stratified_sample(
            df, {str(k): float(v) for k, v in step["fractions"].items()},
            strata_col=step.get("strata_col", "lang"),
            key_col=step.get("key_col", "doc_id"),
            seed=str(step.get("seed", "")),
            default_fraction=float(step.get("default_fraction", 0.0)),
        )
    if op == "mixture":
        from .operators.sampling import weighted_mixture

        return weighted_mixture(
            df, {str(k): float(v) for k, v in step["weights"].items()},
            strata_col=step.get("strata_col", "lang"),
            key_col=step.get("key_col", "doc_id"),
            seed=str(step.get("seed", "")),
            default_weight=float(step.get("default_weight", 1.0)),
        )
    if op == "textstats":
        from .operators.textstats import add_textstats

        return add_textstats(df)
    raise ValueError(f"unknown textpipe op: {op}")


def run_textpipe(spark: SparkSession, cfg: dict) -> dict:
    """Run the configured pipeline; write parquet to output.path plus a
    report.json with per-step row counts.  Returns the report dict.

    Per-step counts cost one extra action each — acceptable bookkeeping
    at pipeline granularity (NOT per row/tile), and the same lineage
    idea as the tiling app's per-tile rows_in/rows_out."""
    df = spark.read.parquet(cfg["input"]["documents"])
    report = {"steps": [], "rows_in": df.count()}
    for step in cfg.get("steps", []):
        df = _apply_step(spark, df, step)
        report["steps"].append({"op": step["op"], "rows": df.count()})
    out = cfg["output"]["path"]
    df.write.mode("overwrite").parquet(out)
    report["rows_out"] = spark.read.parquet(out).count()
    # underscore prefix: Spark/Hadoop file indexes ignore _-files (like
    # _SUCCESS), so the report can live inside the dataset directory
    with open(os.path.join(out, "_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report
