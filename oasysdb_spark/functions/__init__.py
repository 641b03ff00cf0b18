"""Column-level function library: vector distances, text analysis, hashing.

Everything in this package is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd) wherever possible; Pandas UDFs (Arrow
batched) only where the built-ins genuinely can't express the semantics or
measurably lose to NumPy on wide embeddings.
"""

from oasysdb_spark.functions.vectors import (
    cosine_distance,
    distance_expr,
    dot_product,
    l2_norm,
    sqeuclidean,
)

__all__ = [
    "sqeuclidean",
    "cosine_distance",
    "dot_product",
    "l2_norm",
    "distance_expr",
]
