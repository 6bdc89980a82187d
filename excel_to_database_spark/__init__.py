"""excel_to_database_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference ETL service ``leroi-marketing/excel-to-database``
(surveyed in /root/repo/SURVEY.md), plus the relational query surface and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference lacks.

Design stance (SURVEY.md §7.0):
  * DataFrame/SQL everywhere — Catalyst plans, Tungsten executes.
  * No driver-side materialization of data in any operator (100 TB-safe).
  * UDFs only where built-in expressions genuinely cannot express the
    semantics, and then Arrow-batched (pandas_udf / mapInPandas).
"""

from excel_to_database_spark.naming import sqlify, to_alnum
from excel_to_database_spark.report import LoadReport
from excel_to_database_spark.session import get_session

__all__ = ["get_session", "to_alnum", "sqlify", "LoadReport"]

__version__ = "0.1.0"
