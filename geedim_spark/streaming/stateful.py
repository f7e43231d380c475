"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keeps a per-group seen-set across micro-batches:
documents whose text hash was already emitted in ANY earlier batch are
dropped.  Group key = a hash prefix of the text (bounded state cardinality;
state per group is the set of full hashes seen).  This is the streaming form
of the training-data exact-dedup operator — a batch engine dedupes with a
window/groupBy, a stream needs state.

State survives restarts via the checkpoint; with availableNow the operator
drains the backlog and the output contains exactly one row per distinct
text (first occurrence in (batch, doc_id) order within each batch).
"""

from __future__ import annotations

import hashlib
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_OUT_SCHEMA = "doc_id long, text_hash string"
_STATE_SCHEMA = "seen array<string>"
_TTL_STATE_SCHEMA = "seen array<string>, stamps array<long>"
_N_GROUPS = 64


def _dedup_fn(key, pdfs, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    # concat then ONE global sort: chunk-local sorting would make the
    # emitted doc_id for a duplicated hash depend on partition layout,
    # breaking deterministic replay from the checkpoint
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    out = []
    for doc_id, th in zip(pdf["doc_id"], pdf["text_hash"]):
        if th not in seen:
            seen.add(th)
            out.append({"doc_id": int(doc_id), "text_hash": th})
    state.update((sorted(seen),))
    yield pd.DataFrame(out, columns=["doc_id", "text_hash"])


def _evict_expired(
    seen: dict[str, int], now_ms: int, ttl_ms: int
) -> dict[str, int]:
    """Drop hashes last seen before ``now_ms - ttl_ms`` (pure function —
    unit-tested directly; the state wrapper below is Spark plumbing)."""
    floor = now_ms - ttl_ms
    return {h: ts for h, ts in seen.items() if ts >= floor}


def _dedup_ttl_fn(ttl_ms: int):
    def fn(key, pdfs, state: GroupState):
        now_ms = int(time.time() * 1000)
        if state.hasTimedOut:
            # no rows for this group within the TTL: every entry is by
            # definition expired — drop the whole group's state so idle
            # keys cost nothing
            state.remove()
            yield pd.DataFrame([], columns=["doc_id", "text_hash"])
            return
        if state.exists:
            hs, stamps = state.get
            seen = _evict_expired(dict(zip(hs, stamps)), now_ms, ttl_ms)
        else:
            seen = {}
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        out = []
        for doc_id, th in zip(pdf["doc_id"], pdf["text_hash"]):
            if th not in seen:
                out.append({"doc_id": int(doc_id), "text_hash": th})
            seen[th] = now_ms  # refresh last-seen on every occurrence
        items = sorted(seen.items())
        state.update(([h for h, _ in items], [ts for _, ts in items]))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["doc_id", "text_hash"])
    return fn


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_table: str = "stream_dedup_out",
    ttl_minutes: float | None = None,
    sink_dir: str | None = None,
):
    """Start the stateful dedup stream (availableNow); returns the query.

    ``ttl_minutes`` bounds the state at scale: without it the per-group
    seen-set grows with every distinct document forever — the classic
    state blowup of an unbounded stream.  With a TTL, hashes unseen for
    the window are evicted (ProcessingTimeTimeout; idle groups drop their
    whole state via the timeout callback), trading the global guarantee
    for exactly the production contract: "no duplicate emitted within
    ttl of its last occurrence".  None keeps the exact unbounded form
    (right for bounded backfills; the driver oracle uses it).

    ``sink_dir`` writes the deduped rows to a parquet file sink instead
    of the in-memory table — REQUIRED to resume from an existing
    checkpoint (Spark's memory sink does not support checkpoint
    recovery), i.e. for any multi-drain lifecycle.
    """
    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(source_dir)
    )
    hashed = src.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash"),
    ).withColumn("grp", F.pmod(F.xxhash64("text_hash"), F.lit(_N_GROUPS)))

    if ttl_minutes is None:
        deduped = hashed.groupBy("grp").applyInPandasWithState(
            _dedup_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    else:
        deduped = hashed.groupBy("grp").applyInPandasWithState(
            _dedup_ttl_fn(int(ttl_minutes * 60_000)),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_TTL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    w = deduped.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    ).trigger(availableNow=True)
    if sink_dir is not None:
        return w.format("parquet").option("path", sink_dir).start()
    return w.format("memory").queryName(sink_table).start()
