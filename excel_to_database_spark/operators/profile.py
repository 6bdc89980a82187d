"""Column profiling — the ``ANALYZE TABLE``-style statistics pass a
warehouse runs after every load. The reference's only post-load
statistic is the row count in its report string (``app/data.py:122``,
``data.py:148``); this operator is the engine's full-width extension:
one pass over the table produces per-column null counts, distinct
counts, and min/max, in a long (column, stat, value) frame.

Scale design: ONE aggregation job for the whole table — every
per-column statistic is an independent aggregate expression in a
single ``agg`` (Catalyst evaluates them in one partial+final pass with
map-side combine), and the wide 1-row result is unpivoted to the long
frame with a driver-free ``stack``. Exact ``countDistinct`` over many
columns multiplies shuffle width (each distinct agg expands the row);
``approx=True`` swaps in HLL++ sketches, which keep the pass
single-shuffle at any width — the right default at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` into a long frame
    (column, n_nulls, n_distinct, min_str, max_str) — min/max rendered
    to strings so mixed-type tables profile into one frame."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("bigint")).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_str, max_str)"
        )
    )
