"""Identifier sanitization rules.

Reproduces the reference's naming semantics (cited for parity):
  * ``to_alnum`` keeps characters for which ``str.isalnum()`` is true,
    plus underscore — UNICODE-true, so ``café`` stays ``café`` and
    ``名前`` stays ``名前`` (reference: app/data.py:24-27, a
    ``char.isalnum() or char == '_'`` filter). The round-11 version
    used an ASCII ``[A-Za-z0-9_]`` class, which silently renamed
    non-ASCII headers differently than the reference would.
  * ``sqlify`` lower-cases and collapses non-alphanumeric runs to ``_``
    for table names derived from sheet names — deliberately ASCII,
    matching the reference's own ASCII regex exactly (reference:
    app/data.py:84-85, applied at app/home.py:27).

Both are pure driver-side functions — they touch identifiers, never data.
"""

from __future__ import annotations

import re

_SQLIFY_RE = re.compile(r"[^a-zA-Z0-9]+")


def to_alnum(name: str) -> str:
    """Keep only alphanumeric characters (``str.isalnum()``, i.e.
    Unicode categories L*/Nd/Nl/No) and underscores — the reference's
    exact filter semantics (app/data.py:24-27)."""
    return "".join(c for c in name if c == "_" or c.isalnum())


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
