"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set, JVM-side dot products via ``aggregate``/``zip_with`` (no Python in the
hot path), rank with a window.  The scale path is LSH bucketing
(:func:`lsh_bucket_topk`): random-hyperplane signatures prune candidates to
same-bucket pairs, turning the O(N*Q) scan into an equi-join on the bucket
key — the same cover-join shape the spatial engine uses on H3 cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — sequential like a scalar loop, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbours of the first ``n_queries`` vectors.

    Output: (query_id, neighbor_id, rank) — integer-only for oracle hashing;
    ties broken by vec_id for determinism across parallelism.
    """
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    return _rank_topk(sims_with(pairs), k)


def sims_with(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("e")).alias("sim"),
    )


def _rank_topk(sims: DataFrame, k: int) -> DataFrame:
    # rank on round(sim, 6): quantised ordering is stable across engines'
    # float summation order (ties broken by id), making ranks oracle-safe
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("sim"), 6)), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_signature(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random-hyperplane matrix for SimHash-style bucketing."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(emb_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id from hyperplane projections — pure Catalyst:
    one fold per plane, OR-ed into an int."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                emb_col,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    At 100 TB this is the shape that survives: bucket is a shuffle key with
    ~N/2^planes rows per bucket; the per-bucket join is local.  Recall is
    approximate by construction — verify against :func:`cosine_topk`.
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    planes = lsh_signature(dim, n_planes)
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).withColumn("bucket", lsh_bucket(F.col("e"), planes))
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _rank_topk(sims_with(pairs), k)
