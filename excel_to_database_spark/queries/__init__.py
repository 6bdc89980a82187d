"""Query registry — every entry pairs a Spark implementation with a
DuckDB-runnable ANSI-SQL oracle (driver correctness gate, t2).

Modules register into QUERIES/ORACLES via the ``@query`` decorator in
``base``; importing them here assembles the full inventory."""

from excel_to_database_spark.queries.base import ORACLES, QUERIES

# registration side effects
from excel_to_database_spark.queries import relational  # noqa: E402,F401
from excel_to_database_spark.queries import temporal  # noqa: E402,F401
from excel_to_database_spark.queries import llm_ops  # noqa: E402,F401
from excel_to_database_spark.queries import analytics  # noqa: E402,F401
from excel_to_database_spark.queries import extended  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
