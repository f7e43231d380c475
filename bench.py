#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline job (BASELINE.json metric): H3-indexed spatial join + cloud/shadow
mask + tile export over the synthetic image+caption table:

    images --cell-cover join--> ROIs --semi--> mask kernels (decode+portions)
           --explode--> tiles --> parquet export

Reported ``value`` is the headline job's wall seconds; ``tiles_per_sec`` is
the derived throughput; ``queries`` carries per-query seconds for the other
operators.

Modes:
    python bench.py                 # single run at local[$SPARK_GRAFT_CPUS]
    python bench.py --scaling       # local[8] vs local[32] on identical input
                                    # -> scaling efficiency (north rule >=0.8),
                                    # appends evidence to BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from geedim_spark import synth
from geedim_spark.operators import collection_ops, masks, tiler
from geedim_spark.operators import spatial_join as sj
from geedim_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "spatial_join", "mask_portions", "cloud_dist", "tile_grid", "search",
    "pricing_summary", "top_customers", "events_recent", "doc_dup_counts",
    "doc_token_stats", "minhash_sig", "minhash_lsh_pairs", "ann_topk", "ann_lsh",
]


def headline_job(spark: SparkSession, sf_dir: str) -> tuple[float, int]:
    """Spatial join + mask + tile export; returns (seconds, n_tiles)."""
    sf = synth.sf_from_dir(sf_dir)
    n, m = synth.n_images_for_sf(sf), synth.n_rois_for_sf(sf)
    out_dir = tempfile.mkdtemp(prefix="geedim_spark_bench_")
    try:
        t0 = time.time()
        images = synth.images_df(spark, n).filter("fmt = 'raw'")
        rois = synth.rois_df(spark, m)
        matched = sj.filter_bounds_semi(images, rois)
        stats = masks.with_portions(masks.mask_stats(matched))
        enriched = matched.join(stats, "image_id")
        tiles = tiler.explode_tiles(
            enriched, bands=2, max_tile_dim=21, max_tile_bands=1
        ).select(
            "image_id", "caption", "band_start", "band_stop", "row_start",
            "row_stop", "col_start", "col_stop", "tile_transform",
            "fill_portion", "cloudless_portion",
        )
        tiles.write.mode("overwrite").parquet(f"{out_dir}/tiles")
        n_tiles = spark.read.parquet(f"{out_dir}/tiles").count()
        return time.time() - t0, n_tiles
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def run_once(master: str | None) -> dict:
    spark = get_session("geedim_spark_bench", master=master)
    secs, n_tiles = headline_job(spark, SF_DIR)
    qtimes = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)
    spark.stop()
    return {
        "headline_sec": round(secs, 3),
        "n_tiles": n_tiles,
        "tiles_per_sec": round(n_tiles / secs, 1),
        "queries": qtimes,
    }


def main() -> None:
    sf = synth.sf_from_dir(SF_DIR)
    if "--scaling" in sys.argv:
        res8 = run_once("local[8]")
        res32 = run_once("local[32]")
        eff = (res32["tiles_per_sec"] / res8["tiles_per_sec"]) / 4.0
        report = {
            "metric": "tiles/sec headline (spatial join + mask + tile export)",
            "value": res32["headline_sec"],
            "unit": "sec",
            "queries": res32["queries"],
            "sf": sf,
            "tiles_per_sec_local8": res8["tiles_per_sec"],
            "tiles_per_sec_local32": res32["tiles_per_sec"],
            "scaling_efficiency_n_to_4n": round(eff, 3),
        }
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "a") as f:
            f.write(
                f"\n## scaling run sf={sf} ({time.strftime('%Y-%m-%d %H:%M')})\n\n"
                f"| parallelism | headline sec | tiles/sec |\n|---|---|---|\n"
                f"| local[8] | {res8['headline_sec']} | {res8['tiles_per_sec']} |\n"
                f"| local[32] | {res32['headline_sec']} | {res32['tiles_per_sec']} |\n\n"
                f"scaling efficiency N->4N: **{eff:.3f}** (target >= 0.8)\n"
            )
        print(json.dumps(report))
        return

    res = run_once(None)
    print(json.dumps({
        "metric": "tiles/sec headline (spatial join + mask + tile export)",
        "value": res["headline_sec"],
        "unit": "sec",
        "queries": res["queries"],
        "sf": sf,
        "n_tiles": res["n_tiles"],
        "tiles_per_sec": res["tiles_per_sec"],
    }))


if __name__ == "__main__":
    main()
