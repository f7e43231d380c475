#!/usr/bin/env python
"""spark-submit entrypoint: the headline pipeline as a cluster job.

    scripts/make_pyfiles.sh
    spark-submit --master local[8] \
        --py-files dist/geedim_spark.zip scripts/submit_job.py \
        --n 2000 --out /tmp/geedim_spark_submit_out

On a real cluster, swap --master for the cluster manager; the package zip
ships to every executor via --py-files (the north-rule launch path).  The
job is the same spatial-join + mask + tile-export pipeline bench.py times.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from geedim_spark import synth
from geedim_spark.operators import pipeline
from geedim_spark.operators import spatial_join as sj
from geedim_spark.sources import snapshots


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("geedim_spark_submit").getOrCreate()
    images = synth.images_df(spark, args.n, scalar_filter="fmt = 'raw'")
    rois = synth.rois_df(spark, max(2, args.n // 100))
    matched = sj.filter_bounds_semi(images, rois)
    tiles = pipeline.mask_and_tile(matched, scale=synth.SCALE,
                                   max_tile_dim=21, max_tile_bands=1)
    keyed = tiles.join(images.select("image_id", "collection"), "image_id")
    snap_id = snapshots.write_snapshot(keyed, args.out, "collection",
                                       stats_cols=("fill_px",))
    n = snapshots.read_snapshot(spark, args.out).count()
    print(json.dumps({"snapshot": snap_id, "tiles": n}))
    spark.stop()


if __name__ == "__main__":
    main()
