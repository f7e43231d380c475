"""Cell-index invariants: numpy == Spark column == SQL oracle; hierarchy;
kRing clipping."""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F

from geedim_spark import cells


def test_np_cell_invertible_hierarchical():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, cells.WORLD_SIZE, 1000)
    y = rng.uniform(0, cells.WORLD_SIZE, 1000)
    c7 = cells.np_cell(x, y, 7)
    c5 = cells.np_cell(x, y, 5)
    assert np.array_equal(cells.np_parent(c7, 7, 5), c5)


def test_cover_bbox_contains_corners():
    cover = cells.np_cover_bbox(1000, 2000, 1400, 2400, 7)
    for x, y in [(1000, 2000), (1400, 2400), (1200, 2200)]:
        assert cells.np_cell(np.array([x]), np.array([y]), 7)[0] in cover


def test_kring_counts_and_clipping():
    c = cells.np_cell(np.array([50000.0]), np.array([50000.0]), 7)[0]
    assert len(cells.np_kring(c, 1, 7)) == 9
    assert len(cells.np_kring(c, 2, 7)) == 25
    # corner cell: clipped ring
    corner = cells.np_cell(np.array([0.0]), np.array([0.0]), 7)[0]
    assert len(cells.np_kring(corner, 1, 7)) == 4


def test_spark_and_sql_match_numpy(spark):
    rng = np.random.default_rng(1)
    pts = [(float(x), float(y)) for x, y in
           zip(rng.uniform(0, cells.WORLD_SIZE, 200), rng.uniform(0, cells.WORLD_SIZE, 200))]
    df = spark.createDataFrame(pts, "x double, y double")
    got = [r[0] for r in df.select(cells.col_cell(F.col("x"), F.col("y"), 7)).collect()]
    want = cells.np_cell(np.array([p[0] for p in pts]), np.array([p[1] for p in pts]), 7)
    assert got == want.tolist()

    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    sql_got = [r[0] for r in con.execute(
        f"SELECT {cells.sql_cell('x', 'y', 7)} FROM pts").fetchall()]
    assert sql_got == want.tolist()


def test_spark_cover_and_kring_match_numpy(spark):
    df = spark.createDataFrame(
        [(1000.0, 2000.0, 9000.0, 7500.0)], "x0 double, y0 double, x1 double, y1 double"
    )
    got = df.select(
        cells.col_cover_bbox(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), 7)
        .alias("c")
    ).first()["c"]
    want = cells.np_cover_bbox(1000, 2000, 9000, 7500, 7)
    assert sorted(got) == sorted(want.tolist())

    c = int(cells.np_cell(np.array([0.0]), np.array([0.0]), 7)[0])
    got_ring = spark.createDataFrame([(c,)], "cell long").select(
        cells.col_kring(F.col("cell"), 1, 7).alias("r")).first()["r"]
    assert sorted(got_ring) == sorted(cells.np_kring(c, 1, 7).tolist())
