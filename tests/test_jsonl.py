"""JSONL source/sink: round-trip fidelity, malformed-line quarantine,
and the deterministic shard layout."""

import glob
import json
import os

import pandas as pd

SF = "/root/testdata/sf0.001"
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_jsonl_roundtrip_is_exact(spark, tmp_path):
    from batch3dfier_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(*COLS)
    out = str(tmp_path / "j")
    write_jsonl(docs, out)
    got = (read_jsonl(spark, out).select(*COLS).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (docs.toPandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_jsonl_shard_layout_is_deterministic(spark, tmp_path):
    """Same input -> same shard count and same rows per shard (the
    uniform doc_id-hash repartition, not round-robin)."""
    from batch3dfier_spark.sources.jsonl import write_jsonl

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(*COLS)

    def shard_sizes(path):
        write_jsonl(docs, path, n_shards=4, compression=None)
        sizes = {}
        for f in sorted(glob.glob(os.path.join(path, "part-*"))):
            with open(f) as fh:
                ids = sorted(json.loads(ln)["doc_id"] for ln in fh)
            sizes[len(sizes)] = ids
        return sizes

    a = shard_sizes(str(tmp_path / "a"))
    b = shard_sizes(str(tmp_path / "b"))
    assert len(a) == 4
    assert a == b


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    from batch3dfier_spark.sources.jsonl import read_jsonl

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s",'
        ' "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s",'
        ' "n_chars": 7}\n'
    )
    clean = read_jsonl(spark, str(p)).toPandas()
    assert sorted(clean["doc_id"]) == [1, 2]
    full = read_jsonl(spark, str(p), keep_corrupt=True).toPandas()
    bad = full[full["_corrupt_record"].notna()]
    assert len(bad) == 1
    assert bad.iloc[0]["_corrupt_record"] == "this is not json"
