"""Truncate-vs-drop schema reconciliation — the heart of the reference
(app/data.py:117-131 Redshift, :211-241 Snowflake; SURVEY.md §1.3).

Decision table:
  * destination table absent                → CREATE
  * sorted(lower(existing)) == sorted(lower(incoming)) → TRUNCATE+reload
  * otherwise                               → DROP+CREATE (RECREATE)

Column *order* changes are deliberately not detected (data.py:120
comment) — preserved for parity. ``strict=True`` adds the safety the
reference lacks: a reorder with identical column *sets* raises instead
of silently loading misaligned data (SURVEY.md §7.3)."""

from __future__ import annotations

from enum import Enum


class SyncAction(Enum):
    CREATE = "Created"
    TRUNCATE = "Truncated"
    RECREATE = "Recreated"


def decide_sync_action(
    existing_columns: list[str] | None,
    incoming_columns: list[str],
    strict: bool = False,
) -> SyncAction:
    if existing_columns is None:
        return SyncAction.CREATE
    existing = sorted(c.lower() for c in existing_columns)
    incoming = sorted(c.lower() for c in incoming_columns)
    if existing == incoming:
        if strict and [c.lower() for c in existing_columns] != [
            c.lower() for c in incoming_columns
        ]:
            raise ValueError(
                "column order changed with identical column set; refusing to "
                "TRUNCATE-load misaligned data (strict mode)"
            )
        return SyncAction.TRUNCATE
    return SyncAction.RECREATE
