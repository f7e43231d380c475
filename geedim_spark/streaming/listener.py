"""Custom Spark listener: per-batch lineage for the streaming ingest.

North-rule: "per-partition lineage + row-count/mask-coverage metrics emitted
via Spark accumulators and a custom listener".  The accumulators live in
plans/metrics.py; this module is the listener half — a pure-Python
``StreamingQueryListener`` (public API since Spark 3.4, no py4j callback
server needed) that appends one JSON line per lifecycle event to a lineage
log: query start, every micro-batch's row counts / durations / source
offsets, and termination.  Combined with the snapshot manifest's
per-partition stats (sources/snapshots.py), a killed-and-resumed ingest
leaves a complete, append-only audit trail of which rows flowed when.

Reference analog: geedim's tqdm export monitor poll loop (utils.py /
image.py:480-505) — but event-driven rather than polled.
"""

from __future__ import annotations

import json
import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class LineageListener(StreamingQueryListener):
    """Append-only JSONL lineage log driven by streaming lifecycle events.

    Events arrive on Spark's listener-bus thread; the lock keeps concurrent
    appends whole-line atomic.  Records are self-describing (``event`` key),
    so downstream tooling can tail one file for liveness, throughput and
    exactly which source offsets each batch covered.
    """

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

    # -- lifecycle ----------------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self._emit({
            "event": "started", "query_id": str(event.id),
            "run_id": str(event.runId), "name": event.name,
        })

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._emit({
            "event": "progress",
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
            "sources": [
                {
                    "description": s.description,
                    "start_offset": s.startOffset,
                    "end_offset": s.endOffset,
                    "num_input_rows": s.numInputRows,
                }
                for s in (p.sources or [])
            ],
        })

    def onQueryIdle(self, event) -> None:
        self._emit({"event": "idle", "query_id": str(event.id)})

    def onQueryTerminated(self, event) -> None:
        self._emit({
            "event": "terminated", "query_id": str(event.id),
            "exception": event.exception,
        })

    # -- plumbing -----------------------------------------------------------
    def _emit(self, rec: dict) -> None:
        rec["ts"] = time.time()
        line = json.dumps(rec, default=str)
        with self._lock:
            with open(self.path, "a") as f:
                f.write(line + "\n")


class lineage:
    """Context manager: attach a :class:`LineageListener` to the session for
    the duration of a job, detach on exit (the listener bus is
    session-global — leaving it attached would log unrelated queries)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.listener = LineageListener(path)

    def __enter__(self) -> LineageListener:
        self.spark.streams.addListener(self.listener)
        return self.listener

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self.listener)


def read_lineage(path: str) -> list[dict]:
    """Parse a lineage log back into records (tolerates a torn final line)."""
    out = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    except FileNotFoundError:
        pass
    return out


def wait_for_event(path: str, event: str, timeout: float = 30.0) -> dict | None:
    """Poll the log until a record with ``event`` appears (listener events
    are delivered asynchronously on the bus thread)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        for rec in read_lineage(path):
            if rec.get("event") == event:
                return rec
        time.sleep(0.2)
    return None
