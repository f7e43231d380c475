"""Streaming ingestion: images parquet dir -> mask stats -> snapshot commits.

Shape: ``readStream`` (file source, schema pinned) -> ``foreachBatch`` where
each micro-batch runs the batch mask pipeline and commits one snapshot.  The
manifest layer (sources/snapshots.py) makes restarts idempotent per
partition; Spark's checkpointLocation makes the *source* offsets resumable —
together: a killed ingest resumes at the next unprocessed file and re-commits
only uncommitted partitions.

Watermarks/session windows are N/A to the reference's semantics (batch
export); the sessionisation analytic lives in __spark_entry__ as a window
query and could be lifted onto this stream with ``withWatermark`` untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geedim_spark.operators import masks
from geedim_spark.sources import snapshots

IMAGES_SCHEMA = (
    "i long, image_id string, collection string, w int, h int, fmt string, "
    "v int, f_px int, c_px int, x0 double, y0 double, x1 double, y1 double, "
    "caption string, time_start timestamp, bytes binary, phash long"
)


def stream_mask_stats(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the ingest stream; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in ``source_dir`` and
    stops — the test/CI mode; pass False for a continuous ingest.
    For a per-batch lineage log, wrap the run in
    ``streaming.listener.lineage(spark, path)`` — the context manager owns
    the listener's lifecycle (the bus is session-global; registering one
    here with no handle would accumulate listeners across calls and log
    unrelated queries forever).
    """
    src = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        # persist: foreachBatch re-runs the source scan for EVERY action on
        # batch_df (count, the two reads in the join, the snapshot write) —
        # cache once so each micro-batch reads its files exactly once.
        batch_df = batch_df.persist()
        try:
            if batch_df.count() == 0:
                return
            stats = masks.mask_stats(batch_df.filter("fmt = 'raw'"))
            enriched = stats.join(
                batch_df.select("image_id", "collection"), "image_id"
            )
            # append: collections interleave across micro-batches — an
            # overwrite commit would repoint each collection partition at
            # ONLY this batch's rows, discarding earlier batches
            # token = (stream identity, batch id): the checkpoint dir is
            # stable across restarts of THIS stream but distinct between
            # streams, so two streams ingesting one table can never
            # mistake each other's batch N for a replay
            snapshots.write_snapshot(
                enriched, table_dir, "collection",
                stats_cols=("fill_px",), mode="append",
                commit_token=f"{os.path.abspath(checkpoint_dir)}:batch-{batch_id}",
            )
        finally:
            batch_df.unpersist()

    writer = (
        src.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_score_join_stats(
    spark: SparkSession,
    source_dir: str,
    scores: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    score_thresh: float = 0.6,
    available_now: bool = True,
):
    """Stream-STATIC join ingest: streaming image micro-batches joined
    against a static (broadcast) Cloud Score+ match table, per-image
    score-mask stats committed per batch — the reference's match-image
    join (mask.py:287 linkCollection) lifted onto Structured Streaming.

    Shape: the static side is a plain DataFrame — Spark re-plans the
    broadcast join per micro-batch with no state store (stream-static
    joins are stateless by definition), so arbitrarily long streams run
    at constant memory.  Unmatched streaming rows keep the reference's
    fully-masked default (VALID=false -> CLOUDLESS 0), exactly as the
    batch operator; drained output == the batch s2_score_mask_stats
    closed form, which is how the test pins it.

    Returns the StreamingQuery.
    """
    src = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.filter("fmt = 'raw'").persist()
        try:
            if batch_df.limit(1).count() == 0:
                return
            stats = masks.s2_score_mask_stats(
                batch_df, scores, score_thresh=score_thresh
            )
            snapshots.write_snapshot(
                stats, table_dir, "image_id",
                stats_cols=("cloudless_px",), mode="append",
                commit_token=(
                    f"{os.path.abspath(checkpoint_dir)}:score-batch-{batch_id}"
                ),
            )
        finally:
            batch_df.unpersist()

    writer = (
        src.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
