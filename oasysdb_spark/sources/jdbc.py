"""SQL-database record sourcing via Spark's JDBC connector.

Restores the reference family's v0.7 lineage — vector records sourced
from a SQL database such as SQLite/PostgreSQL with metadata
pre-filtering before indexing (/root/reference/docs/changelog.md:41-64)
— in its Spark shape: ``spark.read.jdbc`` is the battle-tested
connector (DriverManager, dialect mapping, predicate pushdown), and the
engine's job is only to map a relational row onto the canonical record
schema (id, embedding, typed metadata maps).

Scale notes: pass ``partition_column``/``lower_bound``/``upper_bound``/
``num_partitions`` (or explicit ``predicates``) so the read is issued
as N parallel range queries instead of one connection pulling the whole
table through a single task — the difference between a bulk load that
saturates the cluster and one that saturates a socket. The ``where``
pre-filter compiles into the JDBC WHERE clause (Catalyst pushes simple
predicates through the connector), so filtered loads never transfer the
excluded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oasysdb_spark import errors

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def read_jdbc_records(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    id_col: str = "id",
    vector_col: str = "embedding",
    metadata_cols: list[str] | None = None,
    properties: dict | None = None,
    predicates: list[str] | None = None,
    where: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a SQL table as canonical vector records.

    The vector column may be a native SQL array (PostgreSQL) or a
    JSON-array text column (SQLite/Derby/MySQL — databases without an
    array type store ``[0.1, 0.2, ...]`` text; the reference's v0.7 SQL
    layer serialized vectors the same way). Text vectors parse with
    ``from_json``; a row whose text does not parse yields a NULL
    embedding, which the dimension guard downstream refuses loudly.

    Metadata columns (default: every column that is not id/vector) map
    onto the closed text|number|boolean enum by their SQL type —
    strings to m_text, numerics to m_num (cast double), booleans to
    m_bool — mirroring the reference's metadata typing
    (/root/reference/src/types/record.rs:42-47). NULL values are
    dropped from the maps (an absent key, not a null entry).
    """
    props = dict(properties or {})
    if predicates is not None:
        df = spark.read.jdbc(url, table, predicates=predicates,
                             properties=props)
    elif partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise errors.InvalidArgumentError(
                "partition_column needs lower_bound, upper_bound and "
                "num_partitions (the JDBC parallel-range contract)"
            )
        df = spark.read.jdbc(
            url, table, column=partition_column,
            lowerBound=lower_bound, upperBound=upper_bound,
            numPartitions=int(num_partitions), properties=props,
        )
    else:
        df = spark.read.jdbc(url, table, properties=props)
    if where:
        # metadata pre-filter (v0.7 lineage): simple predicates compile
        # into the JDBC WHERE clause, so excluded rows never transfer
        df = df.where(where)

    names = {f.name for f in df.schema.fields}
    for need in (id_col, vector_col):
        if need not in names:
            raise errors.InvalidArgumentError(
                f"JDBC table {table!r} has no column {need!r} "
                f"(columns: {sorted(names)})"
            )

    vec_type = df.schema[vector_col].dataType
    vec = F.col(vector_col)
    if isinstance(vec_type, T.ArrayType):
        embedding = vec.cast("array<float>")
    elif isinstance(vec_type, T.StringType):
        embedding = F.from_json(vec, "array<float>")
    else:
        raise errors.InvalidArgumentError(
            f"vector column {vector_col!r} must be an SQL array or a "
            f"JSON-array text column (got {vec_type.simpleString()})"
        )

    if metadata_cols is None:
        metadata_cols = [n for n in df.columns if n not in (id_col, vector_col)]
    text_pairs, num_pairs, bool_pairs = [], [], []
    for name in metadata_cols:
        if name not in names:
            raise errors.InvalidArgumentError(
                f"metadata column {name!r} not in JDBC table {table!r}"
            )
        dt = df.schema[name].dataType
        if isinstance(dt, T.StringType):
            text_pairs += [F.lit(name), F.col(name)]
        elif isinstance(dt, T.BooleanType):
            bool_pairs += [F.lit(name), F.col(name)]
        elif isinstance(dt, _NUMERIC):
            num_pairs += [F.lit(name), F.col(name).cast("double")]
        else:
            raise errors.InvalidArgumentError(
                f"metadata column {name!r} has unsupported type "
                f"{dt.simpleString()}: the record metadata enum is "
                "text|number|boolean "
                "(/root/reference/src/types/record.rs:38-47)"
            )

    def _map(pairs, value_type):
        if not pairs:
            return F.lit(None).cast(f"map<string,{value_type}>")
        # drop NULL values: an absent key, not a null map entry
        return F.map_filter(
            F.create_map(*pairs), lambda _, v: v.isNotNull()
        )

    return df.select(
        F.col(id_col).cast("string").alias("id"),
        embedding.alias("embedding"),
        _map(text_pairs, "string").alias("m_text"),
        _map(num_pairs, "double").alias("m_num"),
        _map(bool_pairs, "boolean").alias("m_bool"),
    )
