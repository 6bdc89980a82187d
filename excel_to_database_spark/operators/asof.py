"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.4 [absent] row: "range/as-of/interval").

Semantics: for every left row, attach the payload of the *latest* right
row with the same key whose timestamp is ``<=`` the left timestamp
(backward as-of; ``direction='forward'`` flips to the earliest ``>=``).

Implementation — the scale-correct union+window merge, not a range
join: tag both sides, union on (key, ts), then ``last(struct(payload),
ignorenulls=True)`` over an ordered window per key carries the most
recent right row's payload struct forward onto each left row (a
struct, so genuinely-NULL payload values survive and columns never mix
across right rows). Cost: ONE shuffle on
the key (same as any join), zero row explosion — a naive
``l.ts >= r.ts`` range join is O(|L|·|R|) per key and falls over at
scale; this is O(|L|+|R|) log-sorted, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """Return ``left`` with ``payload`` columns from the as-of matching
    ``right`` row (null where no match exists).

    ``tiebreak``: right-side column ordering equal-timestamp right rows
    (the greatest wins), making results deterministic.
    ``strict``: exclusive bound (``<`` / ``>``) instead of inclusive.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns

    # Carry ONE struct of all payload columns, non-null exactly for
    # right rows: last/first(ignorenulls=True) then picks the whole
    # matched right row atomically, so (a) a right row whose payload
    # value is genuinely NULL still wins (the struct itself is
    # non-null), and (b) multiple payload columns can never mix values
    # from different right rows.
    from pyspark.sql import types as T

    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    l_side = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r_side = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__payload"),
    )
    u = l_side.unionByName(r_side)

    # Order so that, at the current left row, every eligible right row
    # precedes it. Inclusive backward: right rows at equal ts sort
    # before left rows (__is_left ascending); strict: after.
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__is_left").desc() if strict else F.col("__is_left").asc(), F.col("__tie").asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        order = [F.col("__ts").asc(), F.col("__is_left").asc() if strict else F.col("__is_left").desc(), F.col("__tie").desc()]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first

    w = Window.partitionBy("__key").orderBy(*order).rowsBetween(*frame)
    carried = u.select(
        "*", pick("__payload", ignorenulls=True).over(w).alias("__c")
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *lcols, *[F.col("__c").getField(c).alias(c) for c in payload]
    )


def interval_overlap_pairs(
    df: DataFrame,
    key: str,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap SELF-join: (key, id_a, id_b) for every
    unordered pair of same-key rows whose half-open intervals
    [start, end) overlap — the interval-join member of the §2.4
    range/as-of family. ``start``/``end`` are integer epoch units.

    Scale shape (grid bucketing, the standard distributed interval
    join): each interval explodes into the ``bucket_width``-wide grid
    cells it touches (``⌈len/width⌉+1`` rows; choose width ≈ the
    typical interval length so that is ~2), candidates come from an
    equi-join on (key, bucket) — never a per-key cross product — the
    true overlap predicate filters, and DISTINCT collapses pairs that
    co-occur in several cells. A naive theta join is O(n²) per key and
    is exactly what the SQL oracle brute-forces at test scale.

    Empty/inverted intervals (end ≤ start) are dropped up front: under
    half-open semantics they overlap nothing, but without the filter
    the naive bucket sequence floor(s/w)..floor((e-1)/w) would run
    DESCENDING (generating phantom buckets) and the overlap predicate
    s_a < e_b AND s_b < e_a can still hold for an empty interval
    sitting inside a non-empty one. The ``greatest`` guard on the
    sequence upper bound is belt-and-braces: it keeps the sequence
    non-descending even if the filter is later relaxed."""
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    w = int(bucket_width)
    lo = F.floor(s / w)
    exploded = df.filter(e > s).select(
        F.col(key).alias("k"),
        F.col(id_col).alias("iid"),
        s.alias("s"),
        e.alias("e"),
        # [s, e) touches buckets floor(s/w) .. floor((e-1)/w)
        F.explode(
            F.sequence(lo, F.greatest(lo, F.floor((e - F.lit(1)) / w)))
        ).alias("b"),
    )
    a = exploded.select(
        "k", "b", F.col("iid").alias("id_a"),
        F.col("s").alias("s_a"), F.col("e").alias("e_a"),
    )
    bb = exploded.select(
        "k", "b", F.col("iid").alias("id_b"),
        F.col("s").alias("s_b"), F.col("e").alias("e_b"),
    )
    return (
        a.join(bb, ["k", "b"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
        )
        .select(F.col("k").alias(key), "id_a", "id_b")
        .distinct()
    )
