"""As-of join: backward/forward, inclusive match, tolerance, right-side
NULL-payload survival, and the one-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from geedim_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u1", _ts(5)),
         (4, "u2", _ts(10)), (5, "u3", _ts(10))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(10), 100), ("u1", _ts(15), 150), ("u2", _ts(1), 201),
         ("u2", _ts(30), 230)],
        "user_id string, ts timestamp, view_id long")
    return left, right


def test_backward_inclusive(spark, frames):
    left, right = frames
    out = {r["event_id"]: r for r in asof_join(
        left, right, on="ts", by=("user_id",), payload=("view_id",)
    ).collect()}
    assert out[1]["view_id_right"] == 100      # equal ts matches (inclusive)
    assert out[2]["view_id_right"] == 150      # latest predecessor
    assert out[3]["view_id_right"] is None     # nothing before t=5
    assert out[3]["ts_right"] is None
    assert out[4]["view_id_right"] == 201
    assert out[5]["view_id_right"] is None     # key never seen on right
    assert len(out) == 5                       # every left row survives


def test_forward_direction(spark, frames):
    left, right = frames
    out = {r["event_id"]: r for r in asof_join(
        left, right, on="ts", by=("user_id",), payload=("view_id",),
        direction="forward").collect()}
    assert out[1]["view_id_right"] == 100      # inclusive at equal ts
    assert out[2]["view_id_right"] is None     # nothing at/after t=20
    assert out[3]["view_id_right"] == 100      # next at t=10
    assert out[4]["view_id_right"] == 230


def test_tolerance(spark, frames):
    left, right = frames
    out = {r["event_id"]: r for r in asof_join(
        left, right, on="ts", by=("user_id",), payload=("view_id",),
        tolerance_us=5_000_000).collect()}
    assert out[2]["view_id_right"] == 150      # 5 s away: within bound
    assert out[4]["view_id_right"] is None     # 9 s away: nulled
    assert out[4]["ts_right"] is None


def test_validation(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, direction="nearest")
    with pytest.raises(ValueError, match="tolerance_us"):
        asof_join(left, right, tolerance_us=-1)
    with pytest.raises(ValueError, match="payload overlaps"):
        asof_join(left, right, payload=("user_id",))


def test_plan_shape(spark, frames):
    """One hash exchange per side feeding a KEY-partitioned window —
    no cartesian/range join, no global window."""
    left, right = frames
    plan = (asof_join(left, right, payload=("view_id",))
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spec = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert spec and all("user_id" in ln for ln in spec)


def test_asof_matches_pandas_merge_asof(spark):
    """Deterministic pseudo-random corpus vs pandas ``merge_asof`` — an
    independent reference implementation of the same relation (backward,
    inclusive, by key).  Repartition-invariance is implied: the engine
    result is collected once per layout and compared sorted."""
    import pandas as pd

    # LCG-derived fixture (no RNG in tests): ~120 left rows, ~80 right
    # rows, 5 keys, colliding timestamps on purpose
    def lcg(seed, n, mod):
        x, out = seed, []
        for _ in range(n):
            x = (x * 1103515245 + 12345) % (1 << 31)
            out.append(x % mod)
        return out

    lk = lcg(7, 120, 5)
    lt = lcg(11, 120, 50)
    rk = lcg(13, 80, 5)
    rt = lcg(17, 80, 50)
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame({
        "event_id": range(120),
        "user_id": [f"u{k}" for k in lk],
        "ts": [base + pd.Timedelta(seconds=int(t)) for t in lt],
    })
    # right side must be unique per (key, ts) for merge_asof determinism
    rpdf = (pd.DataFrame({
        "user_id": [f"u{k}" for k in rk],
        "ts": [base + pd.Timedelta(seconds=int(t)) for t in rt],
        "view_id": range(80),
    }).groupby(["user_id", "ts"], as_index=False).agg(
        view_id=("view_id", "max")))

    expected = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("ts", kind="stable"),
        on="ts", by="user_id", direction="backward",
        suffixes=("", "_right"))

    from geedim_spark.operators.asof import asof_join
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = (asof_join(left, right, on="ts", by=("user_id",),
                     payload=("view_id",))
           .toPandas().sort_values("event_id", ignore_index=True))
    exp = expected.sort_values("event_id", ignore_index=True)
    got_v = got["view_id_right"].astype("Float64")
    exp_v = exp["view_id"].astype("Float64")
    assert got_v.equals(exp_v), (
        got_v[got_v != exp_v].head(), exp_v[got_v != exp_v].head())


def test_right_duplicate_ts_deterministic(spark):
    """Two right rows at one (key, ts) with different payloads: the
    maximum payload wins, in both directions, and the result is stable
    under repartitioning."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(20))], "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(10), 5), ("u1", _ts(10), 9), ("u1", _ts(10), 7)],
        "user_id string, ts timestamp, view_id long")
    for rep in (right, right.repartition(3)):
        out = asof_join(left, rep, on="ts", by=("user_id",),
                        payload=("view_id",)).collect()
        assert len(out) == 1 and out[0]["view_id_right"] == 9
    fwd = asof_join(left.withColumn("ts", left.ts), right, on="ts",
                    by=("user_id",), payload=("view_id",),
                    direction="forward").collect()
    assert fwd[0]["view_id_right"] is None  # nothing at/after t=20
