"""Dedup kernels: Arrow kernel == Catalyst column expressions (value
identity), LSH band behaviour, exact-dup counting."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geedim_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(60)


def test_minhash_kernel_equals_catalyst(spark, docs):
    """minhash_sig_df (hashlib kernel) must produce the exact values of the
    Catalyst expression tree (md5 + permutation mins)."""
    kern = {r["doc_id"]: list(r["sig"])
            for r in dedup.minhash_sig_df(docs, n_hashes=6, n=5).collect()}
    cat = {r["doc_id"]: list(r["sig"])
           for r in docs.select(
               "doc_id",
               dedup.minhash_signature(F.col("text"), n_hashes=6, n=5).alias("sig"),
           ).collect()}
    assert kern == cat


def test_simhash_kernel_equals_catalyst(spark, docs):
    kern = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash_df(docs, bits=12, n=5).collect()}
    cat = {r["doc_id"]: r["sh"]
           for r in docs.select(
               "doc_id", dedup.simhash(F.col("text"), bits=12, n=5).alias("sh")
           ).collect()}
    assert kern == cat


def test_exact_dup_counts_with_planted_dups(spark):
    rows = [{"doc_id": i, "text": f"unique {i}"} for i in range(8)]
    rows += [{"doc_id": 100 + i, "text": "same text"} for i in range(3)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["doc_id"]: r["n_copies"] for r in dedup.exact_dup_counts(df).collect()}
    assert all(got[i] == 1 for i in range(8))
    assert all(got[100 + i] == 3 for i in range(3))


def test_lsh_pairs_find_planted_near_dups(spark, docs):
    """A doc and a 1-char-edited copy share most shingles -> same band
    buckets -> candidate pair emitted."""
    base = docs.select("doc_id", "text")
    edited = base.filter("doc_id < 5").select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("x")).alias("text"),
    )
    pairs = dedup.minhash_lsh_pairs(base.unionByName(edited),
                                    n_hashes=16, bands=4, n=5)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["n_shared_bands"]
           for r in pairs.collect()}
    for i in range(5):
        assert (i, i + 5000) in got, f"planted near-dup {i} not found"
        assert got[(i, i + 5000)] >= 1