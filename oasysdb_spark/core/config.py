"""Engine configuration, mirroring the reference's Parameters /
QueryParameters (/root/reference/src/cores/database.rs:17-42).

Defaults match the reference: density=256 (/root/reference/src/main.rs:83-86),
probes=32 and radius=∞ (/root/reference/src/cores/database.rs:39-41).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import asdict, dataclass, field

from oasysdb_spark.errors import InvalidArgumentError
from oasysdb_spark.functions.vectors import METRICS


@dataclass(frozen=True)
class Parameters:
    """Static, set once at configure time (/root/reference/src/main.rs:72-102).

    ``relevancy`` restores the v0.4-lineage per-COLLECTION distance
    cutoff (`collection.relevancy = 3.0`,
    /root/reference/docs/changelog.md:322-331): the default radius for
    queries that pass none. Any value ≤ 0 means disabled — the
    lineage's own sentinel is -1.0 — and an explicit per-query
    ``radius`` always wins (the v0.8 QueryParameters semantics)."""

    dimension: int
    metric: str = "euclidean"
    density: int = 256
    relevancy: float = -1.0

    def __post_init__(self):
        if self.dimension <= 0:
            raise InvalidArgumentError("dimension must be positive")
        if self.metric.lower() not in METRICS:
            raise InvalidArgumentError(
                f"unknown metric {self.metric!r}; supported: {', '.join(METRICS)}"
            )
        if self.density <= 0:
            raise InvalidArgumentError("density must be positive")
        if not isinstance(self.relevancy, (int, float)) or math.isnan(
            self.relevancy
        ):
            raise InvalidArgumentError("relevancy must be a number (≤0 disables)")
        object.__setattr__(self, "metric", self.metric.lower())
        object.__setattr__(self, "relevancy", float(self.relevancy))

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, raw: str) -> "Parameters":
        return cls(**json.loads(raw))


@dataclass(frozen=True)
class QueryParameters:
    """Per-query knobs (/root/reference/src/cores/database.rs:29-42).

    ``radius`` is in the metric's native units — for ``euclidean`` that is
    *squared* distance (/root/reference/src/types/metric.rs:10-12).
    """

    probes: int = 32
    radius: float = field(default=math.inf)

    def __post_init__(self):
        if self.probes <= 0:
            raise InvalidArgumentError("probes must be positive")


def atomic_write_text(path: str, text: str) -> None:
    """Write-tmp-then-rename, the same crash-safety contract as the
    reference's snapshot writer (/root/reference/src/cores/database.rs:155-172)."""
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
