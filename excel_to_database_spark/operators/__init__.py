from excel_to_database_spark.operators.asof import asof_join
from excel_to_database_spark.operators.sessionize import sessionize
from excel_to_database_spark.operators.skew import salted_join

__all__ = ["asof_join", "sessionize", "salted_join"]
