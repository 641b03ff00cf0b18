from oasysdb_spark.core.catalog import Catalog
from oasysdb_spark.core.config import Parameters, QueryParameters
from oasysdb_spark.core.database import Database

__all__ = ["Catalog", "Database", "Parameters", "QueryParameters"]
