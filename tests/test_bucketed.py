"""Bucketed co-located joins: same-key equi-joins run with ZERO shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geedim_spark import synth
from geedim_spark.operators import masks
from geedim_spark.sources import bucketed


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    # warehouse.dir is a static conf; place the tables via a database with
    # an explicit tmp LOCATION instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path / 'wh'}'")
    spark.sql("DROP TABLE IF EXISTS bktest.b_stats")
    spark.sql("DROP TABLE IF EXISTS bktest.b_meta")

    imgs = synth.images_df(spark, 200, scalar_filter="fmt = 'raw'")
    stats = masks.mask_stats(imgs)
    meta = synth.images_meta_df(spark, 200)

    bucketed.write_bucketed(stats, "bktest.b_stats", "image_id", buckets=8)
    bucketed.write_bucketed(
        meta.select("image_id", "collection", "time_start"),
        "bktest.b_meta", "image_id", buckets=8,
    )

    joined = bucketed.read_table(spark, "bktest.b_stats").join(
        bucketed.read_table(spark, "bktest.b_meta"), "image_id"
    )
    # disable broadcast so the join strategy is genuinely sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not bucketed.plan_has_exchange(joined), (
            "bucketed same-key join must not shuffle"
        )
        # and an UNbucketed twin of the same join DOES shuffle
        plain = stats.join(meta.select("image_id", "collection"), "image_id")
        assert bucketed.plan_has_exchange(plain)
        # correctness: identical result set to the plain join
        got = {(r["image_id"], r["total_px"], r["collection"])
               for r in joined.select("image_id", "total_px", "collection").collect()}
        want = {(r["image_id"], r["total_px"], r["collection"])
                for r in plain.select("image_id", "total_px", "collection").collect()}
        assert got == want and len(got) == stats.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bktest.b_stats")
        spark.sql("DROP TABLE IF EXISTS bktest.b_meta")
        spark.sql("DROP DATABASE IF EXISTS bktest")
