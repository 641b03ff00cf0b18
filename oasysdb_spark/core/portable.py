"""Portable snapshot export/import — the cross-installation hand-off the
reference's whole-state snapshot implies.

The reference persists its ENTIRE database as one bincode blob
(/root/reference/src/cores/database.rs:147-187 — ``snapshot`` serializes
state to ``<dir>/snapshot`` and a user moves a database between machines
by copying that file; the blob is version-locked to the Rust structs
that wrote it). The Spark twin is an OPEN format instead: a directory of
plain parquet (the records — the only source of truth) plus a
``manifest.json`` carrying the engine parameters, the record count, an
order-insensitive content fingerprint, and each attached index tier's
build knobs. Anything that reads parquet can read an export, and import
REBUILDS the recorded index tiers from their knobs — indexes are derived
data, and rebuilding beats carrying engine-version-specific layouts (the
same reason the reference's pre-v0.7 lineage rebuilt its HNSW from the
changelog on load rather than trusting a serialized graph).

Layout of an export directory::

    manifest.json     format tag, engine version, Parameters, n_records,
                      fingerprint, tier knobs
    records/          plain (unversioned) parquet, canonical record
                      schema only — id, embedding, m_text, m_num, m_bool

Scale shape: export is ONE distributed parquet write of the current
records version (derived columns dropped — ``cluster_id`` / ``pq_code``
are rebuilt on import) plus one map-side-combined fingerprint
aggregation; import is one distributed parquet read + one bulk
``insert_batch`` append + the recorded tier builds. Nothing is ever
driver-materialized, so a 100 TB database exports/imports at scan speed.

The fingerprint is ``bit_xor`` of a per-row ``xxhash64`` over the
canonical columns (map entries key-sorted first — map iteration order is
not part of record identity). XOR is order-insensitive, so the check is
independent of partitioning and task scheduling on both sides. It is an
integrity check between cooperating installations of THIS engine (both
sides compute it with the same Spark functions); it is not a
cryptographic seal.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oasysdb_spark import errors
from oasysdb_spark.core.config import atomic_write_text

PORTABLE_FORMAT = "oasysdb-portable/1"
MANIFEST_FILE = "manifest.json"
RECORDS_SUBDIR = "records"
_CANONICAL_COLS = ["id", "embedding", "m_text", "m_num", "m_bool"]


def _canonical(df: DataFrame) -> DataFrame:
    """The portable projection: canonical record columns only, derived
    columns (cluster_id, pq_code) dropped — they are rebuilt on import."""
    return df.select(*_CANONICAL_COLS)


def _fingerprint_expr():
    """Per-row xxhash64 over the canonical columns with map entries
    key-sorted (array_sort on entry structs orders by key, the first
    field), serialized through to_json so nested nulls hash
    deterministically."""

    def sorted_entries(c: str):
        return F.to_json(
            F.struct(F.array_sort(F.map_entries(F.col(c))).alias("e"))
        )

    return F.xxhash64(
        F.col("id"),
        F.to_json(F.struct(F.col("embedding").alias("v"))),
        sorted_entries("m_text"),
        sorted_entries("m_num"),
        sorted_entries("m_bool"),
    )


def _fingerprint(df: DataFrame) -> tuple[int, int]:
    row = (
        _canonical(df)
        .select(_fingerprint_expr().alias("k"))
        .agg(F.count("*").alias("n"), F.expr("bit_xor(k)").alias("fp"))
        .first()
    )
    n = int(row["n"])
    fp = int(row["fp"]) if row["fp"] is not None else 0
    return n, fp


def _tier_knobs(db) -> dict:
    """Discover attached index tiers and the knobs needed to rebuild
    them. Knob sources are the tiers' own persisted metadata
    (hnsw.json / pq.json); the IVF tier records only its presence —
    rebuild re-fits k-means with the default seed (the coarse index is
    approximate by contract, and cluster ids are not part of record
    identity)."""
    tiers: dict = {}
    if db.centroids.exists():
        cents = db.centroids.read(db.spark)
        tiers["ivf"] = {"n_clusters": int(cents.count())}
    pq_path = os.path.join(db.dir, "pq.json")
    if os.path.exists(pq_path):
        with open(pq_path) as f:
            meta = json.load(f)
        tiers["pq"] = {
            "m": meta["m"],
            "nbits": meta["nbits"],
            "residual": bool(meta.get("residual", False)),
            # pq.json stores the learned rotation itself; the portable
            # knob is just whether to learn one again on import
            "opq": meta.get("rotation") is not None,
        }
    hnsw_path = os.path.join(db.dir, "hnsw.json")
    if os.path.exists(hnsw_path):
        with open(hnsw_path) as f:
            meta = json.load(f)
        tiers["hnsw"] = {
            k: meta[k]
            for k in ("m", "ef_construction", "shards")
            if k in meta
        }
    return tiers


def export_db(db, out_dir: str, overwrite: bool = False) -> dict:
    """Export ``db`` as a portable snapshot directory. Returns the
    manifest (also written to ``out_dir/manifest.json``)."""
    manifest_path = os.path.join(out_dir, MANIFEST_FILE)
    if os.path.exists(manifest_path) and not overwrite:
        raise errors.InvalidArgumentError(
            f"{out_dir} already holds a portable snapshot "
            "(pass overwrite=True / --overwrite to replace it)"
        )
    records = _canonical(db.records_df())
    os.makedirs(out_dir, exist_ok=True)
    records.write.mode("overwrite").parquet(
        os.path.join(out_dir, RECORDS_SUBDIR)
    )
    # fingerprint the WRITTEN files (not the source frame) so the check
    # covers the bytes that actually travel
    written = db.spark.read.parquet(os.path.join(out_dir, RECORDS_SUBDIR))
    n, fp = _fingerprint(written)
    manifest = {
        "format": PORTABLE_FORMAT,
        "engine_version": db.heartbeat(),
        "parameters": {
            "dimension": db.params.dimension,
            "metric": db.params.metric,
            "density": db.params.density,
        },
        "n_records": n,
        "fingerprint_xxh64_xor": fp,
        "tiers": _tier_knobs(db),
    }
    atomic_write_text(manifest_path, json.dumps(manifest, sort_keys=True))
    return manifest


def import_db(
    spark: SparkSession,
    in_dir: str,
    dest_dir: str,
    rebuild_indexes: bool = True,
    overwrite: bool = False,
    verify: bool = True,
):
    """Import a portable snapshot into a NEW database at ``dest_dir``.
    Verifies count + fingerprint against the manifest, then rebuilds
    the recorded index tiers (IVF first — the residual PQ variant
    requires it). Returns the opened :class:`Database`."""
    from oasysdb_spark.core.database import Database

    manifest_path = os.path.join(in_dir, MANIFEST_FILE)
    if not os.path.exists(manifest_path):
        raise errors.NotFoundError(
            f"{in_dir} is not a portable snapshot (no {MANIFEST_FILE})"
        )
    with open(manifest_path) as f:
        manifest = json.load(f)
    if manifest.get("format") != PORTABLE_FORMAT:
        raise errors.InvalidArgumentError(
            f"unsupported snapshot format {manifest.get('format')!r} "
            f"(this engine reads {PORTABLE_FORMAT})"
        )
    params = manifest["parameters"]
    db = Database.configure(
        spark,
        dest_dir,
        dimension=int(params["dimension"]),
        metric=params["metric"],
        density=int(params["density"]),
        overwrite=overwrite,
    )
    records = spark.read.parquet(os.path.join(in_dir, RECORDS_SUBDIR))
    if verify:
        n, fp = _fingerprint(records)
        if n != manifest["n_records"] or fp != manifest["fingerprint_xxh64_xor"]:
            raise errors.InvalidArgumentError(
                "portable snapshot failed verification: "
                f"count {n} vs manifest {manifest['n_records']}, "
                f"fingerprint {fp} vs manifest "
                f"{manifest['fingerprint_xxh64_xor']} — the records "
                "directory does not match the manifest (truncated copy "
                "or tampered files); re-export or pass verify=False to "
                "import anyway"
            )
    db.insert_batch(records)
    tiers = manifest.get("tiers", {})
    if rebuild_indexes and tiers:
        if "ivf" in tiers:
            from oasysdb_spark.index.ivf import build_index

            build_index(db)
        if "pq" in tiers:
            from oasysdb_spark.index.pq import build_pq

            knobs = tiers["pq"]
            build_pq(
                db,
                m=int(knobs.get("m", 8)),
                nbits=int(knobs.get("nbits", 4)),
                seed=int(knobs.get("seed", 42)),
                residual=bool(knobs.get("residual", False)),
                opq=bool(knobs.get("opq", False)),
            )
        if "hnsw" in tiers:
            from oasysdb_spark.index.hnsw import build_hnsw

            knobs = tiers["hnsw"]
            build_hnsw(
                db,
                m=int(knobs.get("m", 16)),
                ef_construction=int(knobs.get("ef_construction", 100)),
                shards=knobs.get("shards"),
            )
    return db
