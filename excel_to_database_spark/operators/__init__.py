from excel_to_database_spark.operators.asof import asof_join
from excel_to_database_spark.operators.sessionize import sessionize

__all__ = ["asof_join", "sessionize"]
