#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4 / §7.2).

Not part of the frozen driver contract (bench.py) — this is the working
harness for the optimization rounds: time individual registry queries with
the noop sink in the same session shape as bench.py's per-query section,
best-of-N, and optionally dump ``.explain("formatted")`` to a directory.

Usage:
    python bench_extra.py --queries near_dedup_apply,dsir_weights --reps 3
    python bench_extra.py --explain plans/r06 --suffix before --queries ...
    python bench_extra.py                       # all BENCH_QUERIES, reps=2
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES, SF_DIR
from geedim_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names (default: BENCH_QUERIES)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    names = (args.queries.split(",") if args.queries else list(BENCH_QUERIES))
    spark = get_session("geedim_spark_bench_extra")
    entrymod._staged_images(spark, SF_DIR)  # untimed setup, like bench.py
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            spark.catalog.clearCache()
            with open(os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
    spark.stop()
    print(json.dumps({
        "sf_dir": SF_DIR,
        "reps": args.reps,
        "best": {k: min(v) for k, v in out.items()},
        "samples": out,
    }))


if __name__ == "__main__":
    main()
