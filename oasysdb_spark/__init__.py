"""oasysdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of edwinkys/oasysdb (v0.8.0), re-expressed
Spark-first.

The reference (/root/reference) is a single-node Rust vector-database
server: records = {vector: f32[dim], metadata: {str: text|number|bool}},
an incrementally-maintained IVF index, a small metadata-filter DSL, and
top-k / radius ANN queries (see SURVEY.md). This package reproduces those
semantics as a Python library over Spark DataFrames — tables are Parquet,
the index is data (centroids + assignments tables), and queries are
Catalyst plans — then extends the surface with the relational/streaming/
LLM-pipeline operators a 100 TB training-data platform needs.

Nothing here is a port: no locks (table-version isolation), no gRPC
(library API), no bincode (Parquet + atomic committers).
"""

from oasysdb_spark.core.catalog import Catalog
from oasysdb_spark.core.config import Parameters, QueryParameters
from oasysdb_spark.core.database import Database
from oasysdb_spark.errors import InvalidArgumentError, NotFoundError

__version__ = "0.1.0"

__all__ = [
    "Catalog",
    "Database",
    "Parameters",
    "QueryParameters",
    "InvalidArgumentError",
    "NotFoundError",
    "__version__",
]
