"""Gap-based sessionization (batch counterpart of streaming
``session_window``; SURVEY.md §2.9).

A new session starts when the gap to the previous event of the same key
exceeds ``gap_seconds``. Classic lag + cumulative-sum: two window passes
over ONE partitioning (key, ts) — Spark reuses the sort, so the whole
operator is a single shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Append a per-key ``session_col`` (1-based, ordered by time)."""
    order = [F.col(ts).asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.lag(ts).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
