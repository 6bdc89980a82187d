"""Sweep-level window-funnel lint: make the low-cardinality-window
defect class structurally un-reintroducible.

Six consecutive rounds migrated queries off the same defect —
``Window.partitionBy(<low-cardinality key>)`` on a data path (q209,
q210, q140, q167, q208, q32, q216, then q135/q96 as round-15
stragglers): at 100 TB, a window partitioned solely by ``lang`` /
``source`` / ``event_type`` funnels each group's entire slice into ONE
task. Each migration added a hand-enumerated plan-contract entry, and
the stragglers slipped precisely because nobody added theirs. This
lint inverts the burden: the correctness sweep
(``scripts/check_correctness.py``) lints EVERY registered query's
optimized plan, so a new low-cardinality window fails the gate the
round it is introduced — no enumeration required.

Rule: a ``windowspecdefinition`` whose partition clause is non-empty
and consists SOLELY of bare attributes drawn from the known
low-cardinality domain below is a funnel — UNLESS the spec also
partitions by ``__pid`` (the group_rank/global_rank co-partition
contract: the physical partition id bounds every window task to one
partition's share of one group) or by any non-domain column (a
composite with a high-cardinality component is hash-balanced).

Two explicit, documented allowlists (PLANS.md design note): the
built-in-surface showcase set {q31, q44, q47, q113} — queries whose
§2-parity purpose is to certify a built-in SQL/window surface itself
(rank/lag/lead/ntile, percent_rank/cume_dist/nth_value, null
ordering, LATERAL decorrelation) — and the bounded-input set, for
windows whose input frame is bounded by something other than data
volume. Never an LLM-pipeline scale path in either.
"""

from __future__ import annotations

#: Column names whose value domain is known to be small (≤ dozens of
#: values) in this engine's data model — partitioning a window solely
#: by these keys cannot balance at scale. Names are matched on the
#: bare attribute name inside the plan (``lang#13`` → ``lang``).
LOW_CARDINALITY_DOMAINS = frozenset(
    {
        "lang",
        "source",
        "event_type",
        "dim",
        "split",
        "segment",
        "c_mktsegment",
        "l_returnflag",
        "l_linestatus",
        "o_orderstatus",
        "o_orderpriority",
        "l_shipmode",
        "n_name",
        "n_nationkey",
        "r_name",
        "r_regionkey",
        "c_nationkey",
        "s_nationkey",
        "nation",
        "region",
        "returnflag",
    }
)

#: §2 built-in-surface parity showcases (documented in PLANS.md):
#: allowed to window over a low-cardinality key because demonstrating
#: the built-in surface IS their purpose. Membership rule: parity
#: showcases of built-in SQL/window surfaces only — never an
#: LLM-pipeline / scale-path operator; the scale path for each is a
#: shipped primitive (group_rank/group_shift/exact_group_quantiles).
SHOWCASE_ALLOWLIST = frozenset(
    {
        "q31_rank_lag_lead",
        "q44_rank_distributions",
        "q47_null_ordering",
        # LATERAL ... LIMIT parity: the query certifies Catalyst's
        # decorrelation of a correlated lateral subquery into a
        # partitioned window — the surface under test IS the window it
        # plans. Output is 3·|nations| rows; the scale path for
        # top-k-per-group is q32's group_rank(value_desc=True).
        "q113_lateral_topk",
    }
)

#: Windows whose INPUT frame is bounded by something other than data
#: volume — the adjudicated bounded-derived-frame category (q181's
#: |domains| rows, q167's occupied bins, q154's |buckets| rows). The
#: lint reads partition columns, not input cardinality, so these carry
#: their boundedness argument here, one line each.
BOUNDED_INPUT_ALLOWLIST = {
    # the window runs over the HOURLY (type, bucket) aggregate after
    # gap-filling: |event_types| · |span-hours| rows — bounded by the
    # corpus TIME SPAN, not its row count (10 years ≈ 87,600 rows per
    # type at ANY data volume)
    "q153_gapfill_locf": "hourly (type, bucket) aggregate input",
}


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren depth 0 (windowspec args may nest
    CASE/function expressions)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _spec_body(plan: str, start: int) -> str:
    """Return the balanced-paren argument body of the
    ``windowspecdefinition(`` starting at ``start`` (index of the
    opening paren)."""
    depth = 0
    for i in range(start, len(plan)):
        if plan[i] == "(":
            depth += 1
        elif plan[i] == ")":
            depth -= 1
            if depth == 0:
                return plan[start + 1 : i]
    return plan[start + 1 :]  # unbalanced: lint what we can


def _partition_cols(spec_body: str) -> list[str]:
    """The partition clause of a windowspecdefinition: the leading
    args before the first ordered arg (``… ASC/DESC NULLS …``) or the
    ``specifiedwindowframe(…)`` arg."""
    cols = []
    for arg in _split_top_level(spec_body):
        if arg.startswith("specifiedwindowframe"):
            break
        if " ASC" in arg or " DESC" in arg:
            break
        cols.append(arg)
    return cols


def _base_name(expr: str) -> str | None:
    """Bare-attribute name of a partition expression (``lang#13`` →
    ``lang``); None when the expression is not a bare attribute."""
    import re

    m = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*)#\d+[A-Za-z]?", expr.strip())
    return m.group(1) if m else None


def window_funnels(plan: str) -> list[str]:
    """Offending window specs in a plan string: partition clause
    non-empty, no ``__pid``, and every partition expression a bare
    attribute from :data:`LOW_CARDINALITY_DOMAINS`."""
    hits = []
    pos = 0
    marker = "windowspecdefinition("
    while True:
        idx = plan.find(marker, pos)
        if idx < 0:
            return hits
        body = _spec_body(plan, idx + len(marker) - 1)
        pos = idx + len(marker)
        parts = _partition_cols(body)
        if not parts:
            continue
        names = [_base_name(p) for p in parts]
        if any(n == "__pid" for n in names):
            continue
        if all(n is not None and n in LOW_CARDINALITY_DOMAINS for n in names):
            hits.append(f"windowspecdefinition({body[:160]}…)")


def lint_window_funnels(df, query_name: str) -> list[str]:
    """Lint one query's OPTIMIZED plan (post column-pruning/pushdown —
    the plan that actually executes); returns human-readable violation
    strings, empty for allowlisted showcases."""
    if query_name in SHOWCASE_ALLOWLIST or query_name in BOUNDED_INPUT_ALLOWLIST:
        return []
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [f"{query_name}: {h}" for h in window_funnels(plan)]
