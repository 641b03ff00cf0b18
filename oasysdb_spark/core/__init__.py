from oasysdb_spark.core.config import Parameters, QueryParameters
from oasysdb_spark.core.database import Database

__all__ = ["Database", "Parameters", "QueryParameters"]
