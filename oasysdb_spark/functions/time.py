"""Timestamp helpers that work across TIMESTAMP and TIMESTAMP_NTZ.

Parquet timestamps written without ``isAdjustedToUTC`` load as
``TIMESTAMP_NTZ`` in Spark 4 (``spark.sql.parquet.inferTimestampNTZ``
defaults on), and several builtins — ``unix_millis`` among them — accept
only the tz-aware ``TIMESTAMP`` type. ``epoch_ms`` inserts the one cast
needed so every temporal operator is agnostic to which flavor the source
table carries.

The NTZ→TIMESTAMP cast interprets the naive value in the session time
zone. Absolute epoch values therefore shift by the session offset when
the session is not UTC, but every use in this package is a *difference*
or *bucket* of two values casted the same way, so a fixed offset cancels;
results are identical to the DuckDB oracle (which computes on the naive
values directly) in any fixed-offset session zone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(col: Column | str) -> Column:
    """Milliseconds since epoch for a TIMESTAMP **or** TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
