"""Bucketed tables: shuffle-free co-located joins for repeated big-big keys.

Broadcast covers dim-sized sides and salting covers skew, but the third leg
of the shuffle-minimisation story is bucketing: when the SAME big-big join
key is reused across many queries (image_id here — scores, CDI twins, mask
stats, tile manifests all join on it), paying one bucketed write makes every
subsequent equi-join on that key exchange-free: Spark reads matching buckets
side-by-side and sort-merge-joins them without a shuffle.

At 10^12 rows this converts the per-query O(data) shuffle into a one-time
layout cost — the standard warehouse pattern (Hive/Iceberg bucket transform).
This module wraps the saveAsTable plumbing so operators/tests can assert the
exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "image_id",
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and bucket-sorted) by ``key``.

    Sorting within buckets lets the join skip the per-task sort too —
    the SortMergeJoin reads both sides already ordered."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange (excluding
    broadcast exchanges, which move only the small side)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
        for line in plan.splitlines()
    )
