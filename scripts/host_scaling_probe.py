#!/usr/bin/env python
"""Engine-free host-ceiling probe (BENCH/BASELINE.md evidence).

Runs the headline job's ACTUAL per-image kernel work (QA-bit mask ->
focal open/dilate -> decimated EDT -> tile slice + encode) under plain
``multiprocessing`` at 8 vs 32 workers — zero Spark involvement — so the
measured 8->32 efficiency is the HOST's memory-bandwidth/turbo ceiling.
Compare with ``python bench.py --scaling-wide``: if the engine's pair
matches this probe's, the engine adds no scaling overhead of its own.
"""
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def work(i):
    from geedim_spark import codecs
    from geedim_spark.operators import masks

    rng = np.random.default_rng(i)
    px = rng.integers(0, 65535, size=(2, 192, 192), dtype=np.uint16)
    qa = (px[1].astype(np.int64) & (1 << 9)) == (1 << 9)
    cloud = masks.focal_max(masks.focal_min(qa, 2), 5)
    d2 = masks.edt_squared(cloud[::6, ::6])
    n = 0
    for r in range(0, 192, 48):
        for c in range(0, 192, 48):
            n += len(codecs.encode_raw(px[:1, r:r + 48, c:c + 48]))
    return n + int(d2.sum())


def run(workers, tasks=2000):
    with mp.Pool(workers) as p:
        p.map(work, range(workers))  # warm imports
        t0 = time.time()
        p.map(work, range(tasks), chunksize=8)
        return tasks / (time.time() - t0)


if __name__ == "__main__":
    r8 = max(run(8), run(8))
    r32 = max(run(32), run(32))
    print(
        f"real-kernel probe imgs/s local8={r8:.1f} local32={r32:.1f} "
        f"eff={(r32 / r8) / 4:.3f}"
    )


def bw_work(i):
    """Stream ~256 MB through memory — the scan/Arrow-shaped control."""
    a = np.empty(8_000_000, np.int64)
    a[:] = i
    s = 0
    for _ in range(4):
        b = a.copy()  # read+write stream
        s += int(b[::4096].sum())
    return s


def bw_run(workers, tasks):
    with mp.Pool(workers) as p:
        p.map(bw_work, range(workers))  # warm
        t0 = time.time()
        p.map(bw_work, range(tasks), chunksize=2)
        return tasks / (time.time() - t0)
