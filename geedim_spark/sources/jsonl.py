"""JSONL corpus source/sink — the interchange format of text-pipeline
tooling (one JSON object per line, as consumed/produced by e.g. the
Dolma/RedPajama tool chains).

Built on Spark's native JSON datasource (JVM-side Jackson parsing,
predicate/column pruning into the scan) — never a Python UDF:

- ``read_jsonl``: schema-PINNED read (inferSchema on 100 TB means a full
  extra pass; the documents schema is known), PERMISSIVE corrupt-record
  policy with the bad line preserved in ``_corrupt_record`` so ingest
  never drops data silently, or FAILFAST for validation runs.
- ``write_jsonl``: one gzip-able part per partition; deterministic
  content routing comes from the caller's ``repartition`` (content-hash
  sharding like sources/wds.py, not Spark's nondeterministic default
  layout) — this module does not impose an extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-pinned JSONL read.  ``mode``: PERMISSIVE keeps corrupt
    lines in ``_corrupt_record`` (added to the schema automatically),
    FAILFAST raises on the first bad line, DROPMALFORMED discards."""
    if mode not in ("PERMISSIVE", "FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"unknown mode {mode!r}")
    s = schema
    if mode == "PERMISSIVE" and "_corrupt_record" not in s.fieldNames():
        s = T.StructType(
            list(s.fields) + [T.StructField("_corrupt_record", T.StringType())])
    return (
        spark.read.schema(s)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write one JSON object per line.  NULL columns are OMITTED per
    JSON-datasource convention (ignoreNullFields default); pass the
    frame through ``coalesce``/``repartition`` first to control shard
    count/placement."""
    w = df.write.mode("error")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def corrupt_stats(df: DataFrame) -> DataFrame:
    """1-row ingest health: total lines, parsed, corrupt (PERMISSIVE
    read diagnostics — the loud-not-silent counterpart of a 100 TB
    ingest).

    Spark refuses a query that reads ONLY ``_corrupt_record`` from a raw
    JSON scan (the line must be reparsed to fill it), so the parsed
    frame is cached first — the documented workaround, and what an
    ingest does anyway (diagnose, then consume the same parse).  For a
    corpus-scale spot check, point ``read_jsonl`` at a sample of shards
    rather than caching the world."""
    if "_corrupt_record" not in df.columns:
        raise ValueError("corrupt_stats needs a PERMISSIVE read_jsonl frame")
    df = df.cache()
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("long").alias("n_parsed"),
        F.count("_corrupt_record").cast("long").alias("n_corrupt"),
    )
