"""Load reports — the engine's answer to the reference's return strings.

The reference returns human-readable strings like
``"Truncated and loaded into x_excel.customer\n1500 records"``
(app/data.py:134, :153, :202, :255). The engine returns a structured
``LoadReport`` and renders the same message format on demand.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LoadReport:
    """Outcome of one sheet→table sync."""

    action: str  # "Truncated" | "Recreated" | "Created" | "Wrote"
    schema: str
    table: str
    n_records: int

    @property
    def fqtn(self) -> str:
        return f"{self.schema}.{self.table}" if self.schema else self.table

    def message(self) -> str:
        """Reference-format message (app/data.py:134)."""
        return f"{self.action} and loaded into {self.fqtn}\n{self.n_records} records"
