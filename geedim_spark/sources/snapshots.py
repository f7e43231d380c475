"""Iceberg-style snapshot manifests: atomic commits, snapshot isolation,
partition-level resume.

No Iceberg runtime jar ships in this environment (SURVEY §7.0), so the
engine manages its own manifest over plain Parquet:

    table_dir/
      data/<partition_col>=<key>/part-*.parquet
      snapshots/snap-00000001.json      # full partition list + stats
      snapshots/CURRENT                 # pointer, written last (atomic-ish)

Each snapshot records every live partition with row counts and optional
column stats (min/max) — that is what gives:

- **snapshot isolation**: readers resolve CURRENT once and only read files
  listed in that manifest;
- **resume**: :func:`pending_keys` anti-joins the work list against the
  committed partitions, so a killed export restarts only unfinished
  partitions (the reference has no resume — a failed download restarts,
  tile.py:349-378; this is new capability per the north rule);
- **pruning**: min/max stats allow partition skipping before a scan.

The reference's task-monitor polling (image.py:480-505) maps to reading the
manifest; its per-tile retry loop maps to Spark task retries + idempotent
partition overwrite before commit.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "snapshots")


def current_snapshot(table_dir: str) -> dict | None:
    cur = os.path.join(_snap_dir(table_dir), "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        snap_id = f.read().strip()
    with open(os.path.join(_snap_dir(table_dir), f"snap-{snap_id}.json")) as f:
        return json.load(f)


def committed_keys(table_dir: str) -> list:
    snap = current_snapshot(table_dir)
    return [p["key"] for p in snap["partitions"]] if snap else []


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    partition_col: str,
    stats_cols: tuple[str, ...] = (),
) -> str:
    """Write ``df`` partitioned by ``partition_col`` and commit a snapshot.

    Data lands first (dynamic partition overwrite — idempotent per
    partition), stats are aggregated in one pass (2-phase hash agg), the
    manifest JSON is written, and CURRENT flips last via atomic rename.
    Partitions already committed by the parent snapshot are carried forward.
    """
    parent = current_snapshot(table_dir)
    parent_parts = {p["key"]: p for p in parent["partitions"]} if parent else {}
    snap_id = f"{(int(parent['snapshot_id']) + 1) if parent else 1:08d}"

    data_dir = os.path.join(table_dir, "data")
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(data_dir)
    )

    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in stats_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"),
                 F.sum(c).alias(f"sum_{c}")]
    stats = df.groupBy(partition_col).agg(*aggs).collect()

    # Spark %XX-escapes special chars (e.g. '/') in partition dir names —
    # map real dirs back to raw keys instead of constructing paths
    from urllib.parse import unquote
    key_to_dir = {}
    for d in os.listdir(data_dir):
        if d.startswith(f"{partition_col}="):
            key_to_dir[unquote(d.split("=", 1)[1])] = d

    parts = dict(parent_parts)
    for r in stats:
        key = r[partition_col]
        entry = {
            "key": key,
            "path": f"data/{key_to_dir[str(key)]}",
            "row_count": r["row_count"],
        }
        for c in stats_cols:
            entry[f"min_{c}"] = _plain(r[f"min_{c}"])
            entry[f"max_{c}"] = _plain(r[f"max_{c}"])
            entry[f"sum_{c}"] = _plain(r[f"sum_{c}"])
        parts[key] = entry

    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent["snapshot_id"] if parent else None,
        "partition_col": partition_col,
        "partitions": sorted(parts.values(), key=lambda p: str(p["key"])),
    }
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    with open(os.path.join(_snap_dir(table_dir), f"snap-{snap_id}.json"), "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    # CURRENT flips last: write to temp + rename (atomic on POSIX)
    fd, tmp = tempfile.mkstemp(dir=_snap_dir(table_dir))
    with os.fdopen(fd, "w") as f:
        f.write(snap_id)
    os.replace(tmp, os.path.join(_snap_dir(table_dir), "CURRENT"))
    return snap_id


def _plain(v):
    return v if isinstance(v, (int, float, str, type(None), bool)) else str(v)


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: str | None = None
) -> DataFrame:
    """Read exactly the partitions of a snapshot (isolation from later
    commits).  Uses partition-path reads -> Spark still prunes row groups."""
    if snapshot_id is None:
        snap = current_snapshot(table_dir)
    else:
        with open(os.path.join(_snap_dir(table_dir), f"snap-{snapshot_id}.json")) as f:
            snap = json.load(f)
    if snap is None:
        raise FileNotFoundError(f"no snapshot in {table_dir}")
    paths = [os.path.join(table_dir, p["path"]) for p in snap["partitions"]]
    return (
        spark.read.option("basePath", os.path.join(table_dir, "data")).parquet(*paths)
    )


def pending_keys(work: DataFrame, table_dir: str, key_col: str) -> DataFrame:
    """Resume: rows of ``work`` whose partition key is not yet committed."""
    done = committed_keys(table_dir)
    if not done:
        return work
    spark = work.sparkSession
    done_df = spark.createDataFrame([(k,) for k in done], f"{key_col} string")
    return work.join(F.broadcast(done_df), key_col, "left_anti")


def prune_partitions(table_dir: str, stat: str, lo=None, hi=None) -> list:
    """Manifest-level partition pruning on a recorded min/max stat."""
    snap = current_snapshot(table_dir)
    if snap is None:
        return []
    out = []
    for p in snap["partitions"]:
        pmin, pmax = p.get(f"min_{stat}"), p.get(f"max_{stat}")
        if lo is not None and pmax is not None and pmax < lo:
            continue
        if hi is not None and pmin is not None and pmin > hi:
            continue
        out.append(p["key"])
    return out
