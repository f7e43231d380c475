"""Similarity search: exact top-k, LSH recall, IVF exactness at full probe,
near-dup planting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geedim_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_full_probe_equals_exact(spark, emb):
    """nprobe == nlist probes every list -> identical to brute force."""
    exact = _pairs(sim.cosine_topk(emb, n_queries=3, k=5))
    full = _pairs(sim.ivf_topk(emb, n_queries=3, k=5, nlist=4, nprobe=4))
    assert full == exact


def test_ivf_partial_probe_recall(spark, emb):
    exact = _pairs(sim.cosine_topk(emb, n_queries=3, k=5))
    part = _pairs(sim.ivf_topk(emb, n_queries=3, k=5, nlist=4, nprobe=2))
    recall = len(part & exact) / len(exact)
    assert recall >= 0.2  # random data -> ~nprobe/nlist expected


def test_lsh_topk_subset_of_bucket(spark, emb):
    out = sim.lsh_bucket_topk(emb, n_queries=3, k=5, n_planes=2)
    assert out.count() > 0
    assert out.filter("rank > 5").count() == 0


def test_near_dup_recovers_planted(spark, emb):
    from pyspark.sql import functions as F
    base = emb.select("vec_id", "embedding")
    planted = base.filter("vec_id < 10").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float"))
        .alias("embedding"),
    )
    got = {(r["id_a"], r["id_b"]) for r in
           sim.near_dup_pairs(base.unionByName(planted), 0.99).collect()}
    assert got == {(i, i + 100000) for i in range(10)}


def test_ivf_flat_full_probe_equals_exact(spark, emb):
    """Flat-centroid IVF at nprobe == nlist also reduces to brute force."""
    exact = _pairs(sim.cosine_topk(emb, n_queries=3, k=5))
    full = _pairs(sim.ivf_flat_topk(emb, n_queries=3, k=5, nlist=4, nprobe=4))
    assert full == exact


def test_lsh_quantised_matches_numpy_buckets(spark, emb):
    """The int64 bucket key must equal an independent numpy recomputation —
    this is the bit-exactness the SQL oracle relies on."""
    from pyspark.sql import functions as F

    planes = sim.lsh_int_planes(64, 4)
    got = (
        emb.select(
            "vec_id",
            sim.lsh_bucket_quantised(
                sim._as_double(F.col("embedding")), planes
            ).alias("bucket"),
        )
        .toPandas()
        .set_index("vec_id")["bucket"]
    )
    pdf = emb.select("vec_id", "embedding").toPandas()
    V = np.stack(pdf["embedding"].values).astype(np.float64)
    Q = np.floor(V * 4096.0).astype(np.int64)
    proj = Q @ planes.T.astype(np.int64)
    want = ((proj > 0) * (1 << np.arange(4))).sum(axis=1)
    assert (got.loc[pdf["vec_id"]].values == want).all()


def test_lsh_quantised_self_in_own_bucket(spark, emb):
    """Each query's bucket contains itself (excluded) and its ranked
    neighbours all share the bucket."""
    out = sim.lsh_bucket_topk_quantised(emb, n_queries=3, k=5, n_planes=2)
    assert out.count() > 0
    assert out.filter("rank > 5").count() == 0
    assert out.filter("query_id = neighbor_id").count() == 0


def test_centroids_deterministic():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((100, 16))
    a = sim.ivf_centroids(v, 4)
    b = sim.ivf_centroids(v.copy(), 4)
    assert np.array_equal(a, b)
    # unit norm
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_near_dup_bucket_cap_bounds_giant_cluster(spark):
    """A planted 2k-copy embedding cluster is dropped with a warning while
    distinct near-dup pairs survive (scale guard for the bucket self-join)."""
    import warnings
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    v = rng.standard_normal(16).astype(np.float32)
    rows = [{"vec_id": i, "embedding": v.tolist()} for i in range(2000)]
    u = rng.standard_normal(16).astype(np.float32)
    rows += [
        {"vec_id": 50_000, "embedding": u.tolist()},
        {"vec_id": 50_001, "embedding": (2.0 * u).tolist()},  # same direction
    ]
    emb = spark.createDataFrame(pd.DataFrame(rows))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = sim.near_dup_pairs(emb, threshold=0.99, max_bucket_size=500)
        pairs = out.collect()
        got = out._bucket_cap_report.wait()
    assert got["largest_bucket"] == 2000
    msgs = [str(w.message) for w in caught if "near_dup_pairs" in str(w.message)]
    assert msgs and "2000" in msgs[0]
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(50_000, 50_001)}
