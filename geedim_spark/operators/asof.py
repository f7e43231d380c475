"""As-of (nearest-predecessor) join — the time-series alignment primitive
Spark's DataFrame API lacks natively (pandas ships ``merge_asof``;
DuckDB/QuestDB expose ``ASOF JOIN``): every left row matches the single
right row with the greatest timestamp <= its own (backward direction,
inclusive), per key.

The classic distributed implementation is ONE shuffle, no range/cross
join: tag both sides, union, and run a keyed ``last(ignorenulls)``
running window over the merged time order —

  1. right rows carry their payload, left rows carry NULL payload;
  2. sort within each key by (ts, tag) with right-before-left at equal
     timestamps (inclusive match);
  3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING ..
     CURRENT ROW stamps every left row with the latest right payload;
  4. keep left rows; optionally null out matches older than ``tolerance``.

Scale shape (100 TB): a single hash exchange on the key columns for BOTH
sides (exactly what any equi-join would pay), then a key-partitioned
window — never global.  A hot key degrades to that key's single-task
sort, the same skew profile as any keyed window; salting cannot apply
(the running ``last`` needs the key's full ordered history), so skewed
keys should be range-bucketed by time upstream if a single key exceeds a
task.  No UDF anywhere.

The forward direction mirrors with a descending order.  Duplicate right
rows at one (key, ts) are resolved deterministically: the row with the
MAXIMUM payload tuple wins (last in the window's tie order), regardless
of partitioning or input order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    payload: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Match every left row to the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``on`` timestamp,
    within the same ``by`` key.

    Returns all left columns plus ``<on><suffix>`` (the matched right
    timestamp, NULL when unmatched) and each ``payload`` column as
    ``<name><suffix>``.  ``tolerance_us`` (exact integer microseconds)
    nulls out matches further away than the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    byl = list(by)
    pay = list(payload)
    bad = [c for c in pay if c in byl or c == on]
    if bad:
        raise ValueError(f"payload overlaps key/time columns: {bad}")

    m_ts = f"{on}{suffix}"
    lcols = left.columns
    l_tag = left.select(
        *byl, F.col(on),
        F.lit(1).alias("_asof_tag"),
        *[F.col(c) for c in lcols if c not in byl and c != on],
        F.lit(None).cast(right.schema[on].dataType).alias(m_ts),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in pay],
    )
    r_tag = right.select(
        *byl, F.col(on),
        F.lit(0).alias("_asof_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in byl and c != on],
        F.col(on).alias(m_ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in pay],
    )
    merged = l_tag.unionByName(r_tag)

    # Tie policy: right rows sort before left at equal ts (inclusive
    # match, tag 0 < 1); among DUPLICATE right rows at one (key, ts) the
    # payload-tuple order makes last-wins deterministic — the maximum
    # (matched-ts, payload...) tuple is what the left row sees, in both
    # directions, regardless of partitioning or input order.
    tie = [F.asc_nulls_first(m_ts)] + [
        F.asc_nulls_first(f"{c}{suffix}") for c in pay]
    if direction == "backward":
        order = [F.asc(on), F.asc("_asof_tag"), *tie]
    else:
        order = [F.desc(on), F.asc("_asof_tag"), *tie]
    w = (
        Window.partitionBy(*byl).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *byl, on, "_asof_tag",
        *[F.col(c) for c in lcols if c not in byl and c != on],
        F.last(m_ts, ignorenulls=True).over(w).alias(m_ts),
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w)
          .alias(f"{c}{suffix}") for c in pay],
    )
    out = filled.filter(F.col("_asof_tag") == 1).drop("_asof_tag")
    if tolerance_us is not None:
        if direction == "backward":
            dist = (F.unix_micros(F.col(on)) - F.unix_micros(F.col(m_ts)))
        else:
            dist = (F.unix_micros(F.col(m_ts)) - F.unix_micros(F.col(on)))
        ok = dist <= F.lit(tolerance_us)
        out = out.select(
            *byl, on,
            *[F.col(c) for c in lcols if c not in byl and c != on],
            F.when(ok, F.col(m_ts)).alias(m_ts),
            *[F.when(ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
              for c in pay],
        )
    return out
