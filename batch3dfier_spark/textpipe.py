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
      - op: line_dedup                   # C4-style corpus-level line
        min_chars: 10                    #   dedup (rewrites text)
      - op: paragraph_dedup              # blank-line-block dedup;
        mode: keep_first                 #   keep_first | drop_all
        min_chars: 30                    #   (CCNet boilerplate rule)
      - op: scrub_pii                    # emails/IPs/phones -> tokens
                                         #   (+ n_email/n_ip/n_phone)
      - op: quality_filter               # textstats/repetition gates
        min_tokens: 10
        max_dup_line_frac: 0.3
        max_top_bigram_frac: 0.2
      - op: near_dedup                   # minhash|simhash|embedding
        method: minhash                  #   clusters; keep the min-id
        threshold: 0.5                   #   doc per connected component
      - op: decontaminate                # drop docs overlapping an
        benchmark: /path/eval.parquet    #   eval corpus (word n-grams)
        ngram: 4
      - op: hash_sample
        fraction: 0.5
        seed: s1
      - op: hash_split                   # stable train/val/test labels
        splits: [[train, 0.98], [val, 0.01], [test, 0.01]]
        keep: train                      #   optional: filter to one split
      - op: stratified_sample
        fractions: {en: 0.1}
        default_fraction: 1.0
        seed: s2
      - op: mixture
        weights: {zh: 2.5}
        seed: m1
      - op: domain_cap                   # keep <= cap docs per domain
        cap: 1000                        #   (skew-safe smallest-draw
        key_col: source                  #   quota, sampling.cap_per_key)
      - op: url_dedup                    # canonical-URL dedup (needs a
        url_col: url                     #   url column; adds url_canon)
      - op: pack_sequences               # GPT-style packing layout:
        n_ctx: 2048                      #   adds shard/seq_id/seq_off/
        n_shards: 64                     #   n_tokens/spans columns
      - op: strip_dup_spans              # exact-substring dedup (Lee
        n: 8                             #   et al.): remove token runs
        min_docs: 2                      #   shared by >= min_docs docs
      - op: near_dup_labels              # attach near-dup `component`
        method: simhash                  #   labels WITHOUT dropping —
        max_hamming: 8                   #   the stage write materializes
                                         #   the labels table ONCE
      - op: cluster_survivors            # keep the best doc per cluster
        policy: longest                  #   (longest|longest_chars|
                                         #   min_id) from the
                                         #   materialized labels
      - op: semantic_dedup               # SemDeDup over an embedding
        threshold: 0.85                  #   column (joined upstream);
        n_centroids: 1024                #   min-id survivor per cluster
      - op: url_filter                   # C4-style blocklist: drop
        blocked_hosts: [bad.example]     #   blocked domains (and their
        blocked_fragments: [casino]      #   subdomains) + URL fragments
      - op: c4_filter                    # C4 line-level page cleaning
      - op: quality_classifier           # linear quality-model scores
      - op: lm_filter                    # unigram-LM perplexity gate
      - op: contamination_filter         # n-gram benchmark-overlap gate
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["run_textpipe", "parse_textpipe_config", "CUSTOM_OPS"]

# Extension surface: user-registered steps.  A pipeline config may name
# any op registered here; the callable receives (spark, df, step) and
# returns the transformed DataFrame.  Consulted before the built-ins,
# so deployments can also shadow a built-in with a tuned variant.
CUSTOM_OPS: dict = {}


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


def _near_dup_pairs(df: DataFrame, step: dict) -> DataFrame:
    """(id_a, id_b) near-dup candidate edges per the step's method —
    shared by the near_dedup (drop) and near_dup_labels (annotate)
    steps so both see identical cluster graphs."""
    from .operators.dedup import (
        exact_dup_pairs,
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
        # minhash_near_dups PREFILTERS byte-identical docs out of the
        # LSH funnel, so its pairs never name exact duplicates; union
        # the exact-dup star edges back in so a pipeline running
        # near_dedup WITHOUT a preceding exact_dedup still drops them
        # (round-3 ADVICE).  simhash/embedding don't need this: an
        # identical doc has an identical signature/vector and pairs
        # up through the normal candidate path.
        return pairs.select("id_a", "id_b").unionByName(
            exact_dup_pairs(df)
        )
    if method == "simhash":
        return simhash_near_dups(
            df, max_hamming=int(step.get("max_hamming", 8))
        )
    if method == "embedding":
        from .operators.dedup import embedding_near_dups_lsh

        # the recall-gated (>=0.95) hyperplane-LSH funnel: buckets ->
        # candidate pairs -> exact quantized re-score; requires the
        # frame to carry an embedding column (e.g. joined upstream)
        return embedding_near_dups_lsh(
            df,
            dim=int(step["dim"]),
            threshold=float(step.get("threshold", 0.4)),
            id_col="doc_id",
            vec_col=step.get("vec_col", "embedding"),
        )
    raise ValueError(
        f"near-dup method must be minhash|simhash|embedding, got {method}"
    )


def _apply_step(spark: SparkSession, df: DataFrame, step: dict) -> DataFrame:
    op = step["op"]
    if op in CUSTOM_OPS:
        return CUSTOM_OPS[op](spark, df, step)
    if op == "exact_dedup":
        from .operators.dedup import exact_dedup

        keep = (
            exact_dedup(df, text_col=step.get("text_col", "text"))
            .where(~F.col("is_dup"))
            .select("doc_id")
        )
        return df.join(keep, "doc_id")
    if op == "scrub_pii":
        # rewrite text with typed tokens; keep per-category counts as
        # extra columns (n_email / n_ip / n_phone)
        from .operators.textstats import scrub_pii

        text_col = step.get("text_col", "text")
        scrubbed = scrub_pii(df, text_col=text_col)
        return df.drop(text_col).join(scrubbed, "doc_id")
    if op == "line_dedup":
        # corpus-level C4-style line dedup: documents keep their ids
        # but their text is rewritten to the surviving lines
        from .operators.dedup import line_dedup

        text_col = step.get("text_col", "text")
        deduped = line_dedup(
            df, text_col=text_col,
            min_chars=int(step.get("min_chars", 10)),
        )
        return df.drop(text_col).join(deduped, "doc_id")
    if op == "paragraph_dedup":
        # corpus-level paragraph dedup; mode=keep_first (line_dedup
        # rule lifted to blank-line blocks) or drop_all (CCNet rule:
        # no copy of a repeated paragraph survives)
        from .operators.dedup import paragraph_dedup

        text_col = step.get("text_col", "text")
        deduped = paragraph_dedup(
            df, text_col=text_col,
            min_chars=int(step.get("min_chars", 30)),
            mode=step.get("mode", "keep_first"),
        )
        return df.drop(text_col).join(deduped, "doc_id")
    if op == "c4_filter":
        # C4 line-level cleaning (Raffel et al. 2020 sec 2.2): drops
        # poison pages, keeps punctuation-terminated >=min_words lines,
        # drops pages left with < min_lines lines; runs BEFORE dedup
        from .operators.textstats import c4_line_filter

        text_col = step.get("text_col", "text")
        cleaned = c4_line_filter(
            df, text_col=text_col,
            min_words=int(step.get("min_words", 5)),
            min_lines=int(step.get("min_lines", 3)),
        ).drop("n_kept")
        return df.drop(text_col).join(cleaned, "doc_id")
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
    if op == "quality_classifier":
        # model-based quality filtering (operators/quality.py): the
        # linear head of a trained classifier — integer weights from
        # the config (a production run pastes its trained, quantized
        # head here), threshold decision, stateless projection
        from .operators.quality import DEFAULT_THRESHOLD_Q, quality_score

        scored = quality_score(
            df,
            text_col=step.get("text_col", "text"),
            weights={k: int(v)
                     for k, v in (step.get("weights") or {}).items()},
            threshold_q=int(step.get("threshold_q", DEFAULT_THRESHOLD_Q)),
        )
        if step.get("keep_score"):
            return scored.where(F.col("quality_kept")).drop("quality_kept")
        return scored.where(F.col("quality_kept")).drop(
            "quality_q", "quality_kept")
    if op == "near_dedup":
        from .operators.dedup import connected_components

        comp = connected_components(_near_dup_pairs(df, step))
        # keeper = the doc whose id IS the component label; docs never
        # paired keep themselves by absence from the drop list
        drops = comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        return df.join(drops, "doc_id", "left_anti")
    if op == "url_filter":
        # C4-style URL blocklist filtering: keep rows whose host (or
        # any parent domain) is NOT in blocked_hosts and whose URL
        # contains none of blocked_fragments.  Requires a url column.
        from .operators.urltools import url_blocklist_filter

        bl = spark.createDataFrame(
            [(h,) for h in step["blocked_hosts"]], "blocked string"
        )
        keep = (
            url_blocklist_filter(
                df, bl,
                blocked_fragments=step.get("blocked_fragments"),
                url_col=step.get("url_col", "url"),
            )
            .where(F.col("reason").isNull())
            .select("doc_id")
        )
        return df.join(keep, "doc_id")
    if op == "semantic_dedup":
        # SemDeDup (operators/semdedup.py): prune docs whose EMBEDDING
        # duplicates a kept same-cluster member — requires the frame to
        # carry an embedding column (joined upstream, like the
        # near_dedup embedding method).  min-id survivor rule.
        from .operators.semdedup import semdedup

        keep = (
            semdedup(
                df,
                threshold=float(step.get("threshold", 0.4)),
                n_centroids=int(step.get("n_centroids", 64)),
                cluster_cap=int(step.get("cluster_cap", 4096)),
                id_col="doc_id",
                vec_col=step.get("vec_col", "embedding"),
            )
            .where(~F.col("is_dup"))
            .select("doc_id")
        )
        return df.join(keep, "doc_id")
    if op == "near_dup_labels":
        # the MATERIALIZE-ONCE half of the cluster pipeline (round-5
        # verdict #8): attach each doc's near-dup cluster label as a
        # `component` column WITHOUT dropping anything.  The stage
        # write that follows persists the labels table exactly once;
        # a downstream cluster_survivors (or any analysis) step then
        # reads labels from parquet instead of re-running the
        # signature+label-propagation funnel per consumer.
        from .operators.dedup import connected_components

        comp = connected_components(_near_dup_pairs(df, step))
        lbl = comp.select(
            F.col("id").alias("doc_id"), F.col("component")
        )
        return df.join(lbl, "doc_id", "left").withColumn(
            "component", F.coalesce(F.col("component"), F.col("doc_id"))
        )
    if op == "cluster_survivors":
        # survivor-policy dedup over a PRE-MATERIALIZED `component`
        # column (from a near_dup_labels stage): keep the best doc of
        # each cluster by the configured policy.  groupBy-max-struct
        # argmax — no window over cluster members.
        from .operators.dedup import cluster_survivors
        from .operators.textstats import token_count

        if "component" not in df.columns:
            raise ValueError(
                "cluster_survivors needs a `component` column — run a "
                "near_dup_labels step (the materialized labels stage) "
                "before it"
            )
        policy = step.get("policy", "longest")
        text_col = step.get("text_col", "text")
        if policy == "longest":
            score = token_count(F.col(text_col)).cast("bigint")
        elif policy == "longest_chars":
            score = F.length(F.coalesce(F.col(text_col), F.lit(""))).cast(
                "bigint"
            )
        elif policy == "min_id":
            score = F.lit(0).cast("bigint")  # ties -> lowest id wins
        else:
            raise ValueError(
                f"cluster_survivors policy must be "
                f"longest|longest_chars|min_id, got {policy}"
            )
        labels = df.select(
            F.col("doc_id").alias("id"), F.col("component")
        )
        out = cluster_survivors(labels, df.drop("component"), score=score)
        return out.where(F.col(step.get("keep_col", "is_kept"))).drop(
            "is_kept", "score"
        )
    if op == "decontaminate":
        from .operators.dedup import decontaminate

        bench = spark.read.parquet(step["benchmark"])
        flagged = decontaminate(
            df, bench, n=int(step.get("ngram", 4))
        ).select("doc_id")
        return df.join(flagged, "doc_id", "left_anti")
    if op == "contamination_filter":
        # GPT-3-style soft decontamination: drop docs whose distinct
        # word-n-gram overlap with the benchmark exceeds the ppm
        # threshold (operators/contamination.py)
        from .operators.contamination import DEFAULT_CONTAM_PPM, contamination

        bench = spark.read.parquet(step["benchmark"])
        scored = contamination(
            df.select("doc_id", step.get("text_col", "text")), bench,
            n=int(step.get("ngram", 13)),
            text_col=step.get("text_col", "text"),
            threshold_ppm=int(step.get("threshold_ppm",
                                       DEFAULT_CONTAM_PPM)),
        )
        clean = scored.where(~F.col("contaminated")).select("doc_id")
        return df.join(clean, "doc_id")
    if op == "lm_filter":
        # CCNet-style perplexity filter: self-trained unless the
        # config points at a reference corpus (operators/lmscore.py);
        # order: 2 selects the bigram model
        from .operators.lmscore import (
            DEFAULT_LM2_THRESHOLD, DEFAULT_LM_THRESHOLD,
            lm2_score, lm2_train, lm_score, lm_train)

        text_col = step.get("text_col", "text")
        ref = (spark.read.parquet(step["reference"])
               if step.get("reference") else df)
        if int(step.get("order", 1)) == 2:
            scored = lm2_score(
                df, lm_train(ref, text_col=text_col),
                lm2_train(ref, text_col=text_col), text_col=text_col,
                threshold_mbits=int(step.get("threshold_mbits",
                                             DEFAULT_LM2_THRESHOLD)),
            )
            kept = scored.where(F.col("lm2_kept"))
            if step.get("keep_score"):
                return kept.drop("lm2_kept")
            return kept.drop("lm2_bits", "lm2_mbits_big", "lm2_kept")
        scored = lm_score(
            df, lm_train(ref, text_col=text_col), text_col=text_col,
            threshold_mbits=int(step.get("threshold_mbits",
                                         DEFAULT_LM_THRESHOLD)),
        )
        kept = scored.where(F.col("lm_kept"))
        if step.get("keep_score"):
            return kept.drop("lm_kept")
        return kept.drop("lm_bits", "lm_mbits_tok", "lm_kept")
    if op == "hash_sample":
        from .operators.sampling import hash_sample

        return hash_sample(
            df, float(step["fraction"]),
            key_col=step.get("key_col", "doc_id"),
            seed=str(step.get("seed", "")),
        )
    if op == "hash_split":
        # deterministic train/val/test labelling; optional keep: filter
        # the pipeline down to one split (e.g. keep: train)
        from .operators.sampling import hash_split

        splits = step.get("splits")
        out = hash_split(
            df,
            splits=[(str(n), float(w)) for n, w in splits] if splits else None,
            key_col=step.get("key_col", "doc_id"),
            seed=str(step.get("seed", "")),
            split_col=step.get("split_col", "split"),
        )
        if "keep" in step:
            out = out.where(
                F.col(step.get("split_col", "split")) == str(step["keep"])
            )
        return out
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
    if op == "domain_cap":
        from .operators.sampling import cap_per_key

        return cap_per_key(
            df, cap=int(step["cap"]),
            key_col=step.get("key_col", "source"),
            row_key_col=step.get("row_key_col", "doc_id"),
            seed=str(step.get("seed", "")),
        )
    if op == "url_dedup":
        from .operators.urltools import url_dedup

        return url_dedup(
            df, url_col=step.get("url_col", "url"),
            id_col=step.get("id_col", "doc_id"),
        )
    if op == "pack_sequences":
        from .operators.packing import pack_sequences

        packed = pack_sequences(
            df, n_ctx=int(step["n_ctx"]),
            n_shards=int(step.get("n_shards", 64)),
            text_col=step.get("text_col", "text"),
            id_col=step.get("id_col", "doc_id"),
        )
        return df.join(packed, step.get("id_col", "doc_id"))
    if op == "strip_dup_spans":
        from .operators.spans import strip_duplicate_spans

        return strip_duplicate_spans(
            df, n=int(step.get("n", 8)),
            min_docs=int(step.get("min_docs", 2)),
            text_col=step.get("text_col", "text"),
            id_col=step.get("id_col", "doc_id"),
        )
    raise ValueError(f"unknown textpipe op: {op}")


def _parquet_dir_rows(path: str) -> int:
    """Row count of a parquet directory from file FOOTERS only — no
    Spark job, no data read (the same trick commit_staged uses)."""
    import pyarrow.parquet as pq

    total = 0
    for n in os.listdir(path):
        if n.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, n)).metadata.num_rows
    return total


def _stages_root(out: str) -> str:
    """Stage directory for a pipeline writing to `out` — a SIBLING of
    the output dir, never inside it: the final step writes output.path
    with mode=overwrite, which deletes the whole directory, and that
    must not destroy the stage it is reading from (or the manifest)."""
    return out.rstrip("/\\") + "_stages"


def _write_json_atomic(path: str, payload: dict) -> None:
    import uuid

    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)


def run_textpipe(spark: SparkSession, cfg: dict) -> dict:
    """Run the configured pipeline; write parquet to output.path plus a
    report.json with per-step row counts.  Returns the report dict.

    STAGE-MATERIALIZED (round-3 VERDICT #2): each step's output is
    written to a parquet stage dir and re-read, so (a) step k+1's
    plan starts from a fresh scan — step k's work (a minhash funnel, a
    decontamination join) executes exactly ONCE, never re-run by a
    downstream action — and (b) the per-step row counts come from the
    written files' footer metadata, costing zero extra Spark jobs.
    The old shape (one lazy chain + df.count() per step) re-executed
    steps 1..k for every count: O(steps^2) total work on what is
    supposed to be the 100 TB surface.  The write is proportional to
    each step's OUTPUT (monotone shrinking for filters); the last
    step writes straight to output.path (no extra copy).

    RESUMABLE (round-4 VERDICT #6, mirroring run_tiles resume): stages
    persist under `<output.path>_stages/` with an atomically-updated
    step manifest recording each completed step's config fingerprint
    and row count.  A re-run after a crash at step k+1 verifies the
    longest manifest prefix that still matches the config (fingerprint
    per step, input path, and the stage's _SUCCESS marker), restarts
    from the last completed stage's parquet, and executes ONLY the
    remaining steps — a 100 TB pipeline that dies at step 7 of 9 no
    longer restarts from zero.  Changing the config (or input)
    invalidates exactly the steps from the first difference onward.
    On success the stage dirs are removed unless output.keep_stages is
    true; on failure they are kept for the resume."""
    in_path = cfg["input"]["documents"]
    steps = cfg.get("steps", [])
    out = cfg["output"]["path"]
    stages = _stages_root(out)
    man_path = os.path.join(stages, "_manifest.json")
    fps = [json.dumps(s, sort_keys=True) for s in steps]
    dests = [
        out if k == len(steps) - 1
        else os.path.join(stages, f"step_{k:02d}_{s['op']}")
        for k, s in enumerate(steps)
    ]

    # -- resume: longest valid completed prefix from the manifest ---------
    man: dict | None = None
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("input") != in_path:
            man = None
    done: list[dict] = []
    if man is not None:
        for k, e in enumerate(man.get("steps", [])):
            if (k >= len(steps) or e.get("fp") != fps[k]
                    or not os.path.exists(
                        os.path.join(dests[k], "_SUCCESS"))):
                break
            done.append(e)

    if done:
        rows_in = int(man["rows_in"])
        df = (None if len(done) == len(steps)
              else spark.read.parquet(dests[len(done) - 1]))
    else:
        df = spark.read.parquet(in_path)
        rows_in = df.count()

    report: dict = {"steps": [], "rows_in": rows_in}
    man_out = {"input": in_path, "rows_in": rows_in,
               "steps": [dict(e) for e in done]}
    for e in done:
        report["steps"].append({"op": e["op"], "rows": e["rows"]})

    for k in range(len(done), len(steps)):
        df = _apply_step(spark, df, steps[k])
        os.makedirs(stages, exist_ok=True)
        df.write.mode("overwrite").parquet(dests[k])
        rows = _parquet_dir_rows(dests[k])
        report["steps"].append({"op": steps[k]["op"], "rows": rows})
        # manifest append AFTER the stage write: the atomic manifest
        # swap is the step's commit point (a half-written stage is
        # simply overwritten on the next run)
        man_out["steps"].append({"op": steps[k]["op"], "fp": fps[k],
                                 "rows": rows})
        _write_json_atomic(man_path, man_out)
        df = spark.read.parquet(dests[k])

    if not steps:
        df.write.mode("overwrite").parquet(out)
    report["rows_out"] = _parquet_dir_rows(out)
    # underscore prefix: Spark/Hadoop file indexes ignore _-files
    # (like _SUCCESS), so the report can live inside the dataset
    # directory
    with open(os.path.join(out, "_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    if not cfg["output"].get("keep_stages", False):
        import shutil

        shutil.rmtree(stages, ignore_errors=True)
    return report
