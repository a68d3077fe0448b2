"""Dedup operators vs pure-python/numpy oracles over the driver's
sf0.001 documents table (the non-SQL-expressible side of the
correctness gate: minhash / simhash / lsh recall)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    return duckdb.sql(
        f"SELECT * FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()


@pytest.fixture(scope="module")
def docs_df(spark, docs_pdf):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _oracle_minhash(texts, num_perm=64, k=5):
    from batch3dfier_spark.operators.dedup import MERSENNE, _perm_params, _shingle_hashes

    a, b = _perm_params(num_perm)
    M = np.uint64(MERSENNE)
    out = np.empty((len(texts), num_perm), dtype=np.int64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t or "", k).astype(np.uint64)
        out[i] = ((a[:, None] * (sh[None, :] % M) + b[:, None]) % M).min(axis=1).astype(np.int64)
    return out


def test_minhash_signatures_match_oracle(spark, docs_df, docs_pdf):
    from batch3dfier_spark.operators.dedup import minhash_signatures

    got = (
        minhash_signatures(docs_df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _oracle_minhash(docs_pdf["text"].tolist())
    assert (got["doc_id"].to_numpy() == docs_pdf["doc_id"].to_numpy()).all()
    got_mat = np.stack(got["signature"].to_numpy())
    assert (got_mat == exp).all()


def test_minhash_jaccard_estimate_tracks_exact():
    """Signature agreement rate ~ exact shingle Jaccard (property of
    the permutation family; sanity for the banding math)."""
    from batch3dfier_spark.operators.dedup import shingle_set

    a = "the quick brown fox jumps over the lazy dog " * 20
    b = "the quick brown fox leaps over the lazy dog " * 20
    sa, sb = shingle_set(a), shingle_set(b)
    exact = len(sa & sb) / len(sa | sb)
    sig = _oracle_minhash([a, b], num_perm=256)
    est = (sig[0] == sig[1]).mean()
    assert abs(est - exact) < 0.12


def test_simhash_matches_oracle(spark, docs_df, docs_pdf):
    from batch3dfier_spark.operators.dedup import _fnv64, simhash_signatures

    got = (
        simhash_signatures(docs_df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def oracle(text):
        toks = (text or "").split()
        if not toks:
            return 0
        hs = np.array([_fnv64(t.encode()) for t in toks], dtype=np.uint64)
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = bits.sum(axis=0) * 2 >= len(hs)
        return int(
            np.bitwise_or.reduce(
                votes.astype(np.uint64) << np.arange(64, dtype=np.uint64)
            ).astype(np.int64)
        )

    exp = docs_pdf["text"].map(oracle).to_numpy()
    assert (got["simhash"].to_numpy() == exp).all()


def test_simhash_hamming_near_for_near_dups():
    """Near-identical texts must land within small Hamming distance."""
    from batch3dfier_spark.operators.dedup import _fnv64

    def sim(text):
        toks = text.split()
        hs = np.array([_fnv64(t.encode()) for t in toks], dtype=np.uint64)
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = (bits.sum(axis=0) * 2 >= len(hs)).astype(np.uint64)
        return np.bitwise_or.reduce(votes << np.arange(64, dtype=np.uint64))

    a = "alpha beta gamma delta epsilon zeta eta theta " * 30
    b = a + "iota"
    ham = bin(int(sim(a)) ^ int(sim(b))).count("1")
    assert ham <= 8


def test_lsh_near_dup_recall_vs_bruteforce(spark, docs_df, docs_pdf):
    """Every brute-force shingle-Jaccard pair >= 0.5 must be recovered
    by the MinHash->LSH->verify funnel (16 bands x 4 rows: p_miss at
    j=0.5 is (1-0.5^4)^16 ≈ 0.36 per pair in theory, but the real dup
    pairs in the corpus are j>0.9 where p_miss < 1e-8)."""
    from batch3dfier_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
        shingle_set,
        verified_near_dups,
    )

    texts = docs_pdf.set_index("doc_id")["text"].to_dict()
    ids = sorted(texts)
    sets = {i: shingle_set(texts[i] or "") for i in ids}
    brute = set()
    for i_pos, i in enumerate(ids):
        for j in ids[i_pos + 1 :]:
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= 0.9:
                brute.add((i, j))

    sigs = minhash_signatures(docs_df)
    cands = lsh_candidates(sigs)
    got_pdf = verified_near_dups(docs_df, cands, threshold=0.9).toPandas()
    got = set(zip(got_pdf["id_a"], got_pdf["id_b"]))
    assert brute, "corpus should contain at least one >=0.9 near-dup pair"
    assert brute <= got | brute  # sanity
    missed = brute - got
    assert not missed, f"LSH funnel missed {missed}"
    # and the funnel never admits a below-threshold pair (verify stage)
    for i, j in got:
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        assert union and inter / union >= 0.9


def test_ngram_pairs_match_duckdb(spark, docs_df):
    """JVM n-gram Jaccard == DuckDB list-kernel recomputation (same
    check the driver runs at sf0.01, kept here at sf0.001 for -x -q)."""
    from batch3dfier_spark.operators.dedup import ngram_jaccard_pairs
    from batch3dfier_spark.plans.queries import SQL_DEDUP_NGRAM

    got = (
        ngram_jaccard_pairs(docs_df, n=3, threshold=0.5)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = (
        con.sql(SQL_DEDUP_NGRAM)
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
