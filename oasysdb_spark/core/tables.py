"""Versioned parquet tables with atomic pointer swap.

A table is a directory of immutable version subdirectories plus a
``_LATEST`` pointer file; writers produce ``v{n+1}`` and atomically swap
the pointer (os.replace). Readers resolve the pointer once and then only
ever see that immutable version — the distributed analog of the
reference's whole-state snapshot + rename persistence
(/root/reference/src/cores/database.rs:147-187) and of its coarse RwLock
isolation (/root/reference/src/cores/database.rs:74-75): readers never
observe a half-written table, with zero locks.

On a real cluster this role is played by a transactional table format
(Delta/Iceberg); the pointer-file scheme keeps the same semantics with
plain Parquet and no extra dependencies.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from oasysdb_spark.core.config import atomic_write_text

_LATEST = "_LATEST"


class VersionedTable:
    def __init__(self, root: str):
        self.root = root

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.root, _LATEST))

    def current_version(self) -> str | None:
        try:
            with open(os.path.join(self.root, _LATEST), encoding="utf-8") as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def current_path(self) -> str:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.root} has no committed version")
        return os.path.join(self.root, v)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.current_path())

    def _next_version(self) -> str:
        cur = self.current_version()
        n = int(cur[1:]) + 1 if cur else 1
        return f"v{n:06d}"

    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        keep_versions: int = 2,
    ) -> str:
        """Write df as the next version and swap the pointer atomically."""
        os.makedirs(self.root, exist_ok=True)
        version = self._next_version()
        path = os.path.join(self.root, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        atomic_write_text(os.path.join(self.root, _LATEST), version)
        self._gc(keep_versions)
        return version

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Append files into the current version (no pointer change).

        Parquet file writes are atomic per-file; a reader that resolved the
        version before the append simply sees the old file set. Used for
        micro-batch inserts; full rewrites (delete/update/index build) go
        through :meth:`write`.
        """
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.current_path())

    def _gc(self, keep: int) -> None:
        try:
            versions = sorted(
                d for d in os.listdir(self.root) if d.startswith("v") and d[1:].isdigit()
            )
        except FileNotFoundError:
            return
        current = self.current_version()
        for v in versions[:-keep] if len(versions) > keep else []:
            if v != current:
                shutil.rmtree(os.path.join(self.root, v), ignore_errors=True)
