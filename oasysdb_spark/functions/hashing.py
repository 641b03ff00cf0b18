"""Deterministic cross-engine hashing.

The dedup operators (MinHash/LSH, SimHash, fingerprinting) need a hash
family that the DuckDB correctness oracle can reproduce bit-for-bit.
Spark's ``xxhash64`` and DuckDB's ``hash`` are different functions, so we
standardize on **md5 → first 15 hex digits → int64** (60 bits, always
positive, fits bigint):

- Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to bigint
- DuckDB: ``CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)``

A salted family h_j(s) = hash64(s || '#' || j) provides the independent
hash functions MinHash needs — cheaper to express identically in two
engines than the usual (a·x + b) mod p family, and md5 is uniform enough
for sketching. md5/conv/substring are codegen'd built-ins; note that
*higher-order array functions wrapping them* (transform/aggregate) are
interpreted, which is why the MinHash hot path computes this same family
in an Arrow-batched pandas UDF (operators/dedup.py) — the hash VALUES are
identical either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(c: Column | str, salt: str | None = None) -> Column:
    """60-bit positive hash of a string column (md5-based, see module doc)."""
    c = F.col(c) if isinstance(c, str) else c
    s = F.concat(c, F.lit(f"#{salt}")) if salt is not None else c
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, salt: str | None = None) -> str:
    """The DuckDB rendering of :func:`hash64` for oracle queries."""
    s = f"({expr}) || '#{salt}'" if salt is not None else expr
    return f"CAST('0x' || substring(md5({s}), 1, 15) AS BIGINT)"
