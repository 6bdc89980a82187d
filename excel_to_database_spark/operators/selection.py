"""Exact distributed selection (order statistics) WITHOUT a global
sort: histogram descent.

``top_k_cutoff`` finds the exact (score, id) cutoff of the global
top-k under ``ORDER BY score DESC, id ASC`` using only bounded
aggregations — the selection primitive behind "keep the best
f·N documents corpus-wide" quality budgets. A global sort of 100 TB
to read one cutoff row is the canonical scalability mistake; the
histogram descent replaces it with ≤4 map-side-combinable
aggregations whose results are ≤4096 rows each:

  level 0: bucket scores into ≤4096 equal-width integer ranges, count
           per bucket (one aggregation), walk the prefix on the driver
           (≤4096-row meta read), keep the bucket containing the k-th
           row and the residual k' inside it;
  level n: re-bucket only the surviving score range (rows shrink every
           level) until the bucket width is 1 — the exact threshold
           score — then descend the same way over ``id`` INSIDE the
           threshold score's tie group to resolve the tie-break id.

Each level's aggregation is a hash aggregate with map-side combine
(bucket cardinality ≤4096 ⇒ tiny shuffle), and the number of levels is
⌈log₄₀₉₆(range)⌉ ≤ 6 for any bigint range — data-independent. The
driver reads only histogram rows (bounded meta reads, the repo-wide
``.collect()`` policy), never data rows.

Scores and ids must be integral (bigint-castable) — which also makes
every decision integer-exact and engine-portable (the oracle-exactness
discipline: no percentile interpolation semantics to reconcile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FANOUT = 4096


def _descend(df: DataFrame, col: str, k: int, descending: bool) -> tuple[int, int]:
    """Return ``(value, residual)``: the value of the k-th row under
    ``ORDER BY col DESC`` (or ASC), and how many of the k rows lie at
    that value (the tie-group residual). One ≤4096-row histogram
    aggregation per level; the frame is re-filtered to the surviving
    bucket between levels, so each level scans fewer rows."""
    c = F.col(col)
    bounds = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    while True:
        width = max(1, -(-(hi - lo + 1) // _FANOUT))  # ceil-div
        hist = {
            int(r["b"]): int(r["n"])
            for r in (
                df.filter((c >= lo) & (c <= hi))
                .groupBy(((c - F.lit(lo)) / F.lit(width)).cast("bigint").alias("b"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        }
        order = sorted(hist, reverse=descending)
        cum = 0
        for b in order:
            if cum + hist[b] >= k:
                k -= cum
                lo, hi = lo + b * width, min(hi, lo + b * width + width - 1)
                break
            cum += hist[b]
        else:  # k exceeds the row count: cutoff is the last value
            b = order[-1]
            k = hist[b]
            lo, hi = lo + b * width, min(hi, lo + b * width + width - 1)
        if width == 1:
            return lo, k


def top_k_cutoff(df: DataFrame, score_col: str, id_col: str, k: int) -> dict:
    """Exact cutoff of the global top-``k`` rows of ``df`` under
    ``ORDER BY score DESC, id ASC``, as
    ``{"score": s*, "id": i*, "n_above": a}``: the kept set is exactly
    ``score > s* OR (score = s* AND id <= i*)`` (ids are assumed
    unique, the usual primary-key case). No sort at any scale — see
    the module docstring for the descent contract."""
    if k <= 0:
        raise ValueError(f"need k > 0, got {k}")
    s_star, resid = _descend(df, score_col, k, descending=True)
    n_above = k - resid
    ties = df.filter(F.col(score_col) == s_star)
    i_star, _ = _descend(ties, id_col, resid, descending=False)
    return {"score": s_star, "id": i_star, "n_above": n_above}


def keep_budget_report(
    df: DataFrame,
    score_col: str,
    id_col: str,
    group_col: str,
    keep_frac: "object",
) -> DataFrame:
    """Per-group report of a corpus-wide quality budget: keep the
    globally best ``⌈keep_frac·N⌉`` rows by ``(score DESC, id ASC)``
    and report, per ``group_col``: n_rows, n_kept, plus the global
    cutoff (threshold_score, threshold_id) on every row.

    ``keep_frac`` accepts a ``fractions.Fraction`` (or float, converted
    exactly) so k = ⌈f·N⌉ is computed in INTEGER arithmetic —
    identical in any engine even when f·N lands exactly on an integer
    (the q170 decontamination-verdict discipline).

    The cutoff costs the histogram descent (no sort); the report is
    then ONE map-side-combinable aggregation with the kept predicate
    as an integer conditional. At 100 TB: ≤6 tiny-shuffle aggregations
    plus one group-by — nothing ever sorts, and the broadcast of the
    2-integer cutoff is free."""
    from fractions import Fraction

    f = Fraction(keep_frac)
    n = df.count()
    k = -(-(n * f.numerator) // f.denominator)  # ceil(n·f), exact
    cut = top_k_cutoff(df, score_col, id_col, int(k))
    s, c = F.col(score_col), F.col(id_col)
    kept = (s > cut["score"]) | ((s == cut["score"]) & (c <= cut["id"]))
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(kept.cast("bigint")).alias("n_kept"),
        F.lit(cut["score"]).cast("bigint").alias("threshold_score"),
        F.lit(cut["id"]).cast("bigint").alias("threshold_id"),
    )
