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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_OUT_SCHEMA = "doc_id long, text_hash string"
_STATE_SCHEMA = "seen array<string>"
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


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_table: str = "stream_dedup_out",
):
    """Start the stateful dedup stream (availableNow); returns the query."""
    src = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(source_dir)
    )
    hashed = src.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash"),
    ).withColumn("grp", F.pmod(F.xxhash64("text_hash"), F.lit(_N_GROUPS)))

    deduped = hashed.groupBy("grp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory").queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
