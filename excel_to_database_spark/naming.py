"""Identifier sanitization rules.

Reproduces the reference's naming semantics (cited for parity):
  * ``to_alnum`` keeps only ``[A-Za-z0-9_]`` in column identifiers
    (reference: app/data.py:24-27).
  * ``sqlify`` lower-cases and collapses non-alphanumeric runs to ``_``
    for table names derived from sheet names (reference: app/data.py:84-85,
    applied at app/home.py:27).

Both are pure driver-side functions — they touch identifiers, never data.
"""

from __future__ import annotations

import re

_ALNUM_RE = re.compile(r"[^A-Za-z0-9_]")
_SQLIFY_RE = re.compile(r"[^a-zA-Z0-9]+")


def to_alnum(name: str) -> str:
    """Strip every character outside ``[A-Za-z0-9_]`` from an identifier."""
    return _ALNUM_RE.sub("", name)


def sqlify(name: str) -> str:
    """Lower-case and collapse non-alphanumeric runs to ``_``."""
    return _SQLIFY_RE.sub("_", name.lower())


def sanitize_columns(columns: list[str]) -> list[str]:
    """Apply ``to_alnum`` to a header row, de-duplicating collisions.

    The reference never de-duplicates (two headers that sanitize to the
    same identifier would produce invalid DDL, app/data.py:128-131); the
    engine appends ``_2``, ``_3``… so the DataFrame stays valid, and
    names empty results ``col_<i>``.
    """
    seen: dict[str, int] = {}
    out: list[str] = []
    for i, raw in enumerate(columns):
        base = to_alnum(str(raw)) or f"col_{i}"
        n = seen.get(base, 0)
        seen[base] = n + 1
        out.append(base if n == 0 else f"{base}_{n + 1}")
    return out
