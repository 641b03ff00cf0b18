"""Named-collection catalog: many vector collections under one root.

The reference's v0.3–v0.6 lineage was multi-collection — one `Database`
held named `Collection`s (`db.save_collection("vectors", &collection)` /
`create_collection` / `get_collection`,
/root/reference/docs/changelog.md:350-368); the v0.8 snapshot collapsed
to one collection per database directory. This module restores the
catalog tier on top of the v0.8-shaped :class:`Database`: a catalog root
holds N independent collections, each its own `Database` directory with
its own Parameters (dimension/metric/density) and its own index tiers.

Layout on disk (all under ``root``)::

    catalog.json              membership manifest (authoritative)
    collections/<dir-id>/     one Database directory per collection

Names are INDIRECTED: each manifest entry maps a collection name to a
generated directory id, so every name-level operation — rename, swap,
replace — is ONE atomic manifest write (write-tmp-rename, the same
crash-safety contract as params.json) with no window where a reader can
observe a half-moved collection. That is what makes the blue-green
reindex pattern safe at 100 TB scale: build the re-indexed copy aside
under a staging name, ``swap_collections("live", "staging")`` — readers
atomically cut over — then drop the staging name holding the old data.
Re-indexing in place would instead serve from a half-built index for
hours.

Crash discipline: directories are only ever CREATED before their
manifest entry appears and DELETED after their entry is gone, so the
only crash residue is an UNREFERENCED directory — never a manifest
entry pointing at a missing or misconfigured directory.
:meth:`Catalog.vacuum` reclaims unreferenced directories: by the
ordering above a directory the manifest doesn't reference is an
interrupted create (no reader ever saw it) or an interrupted
drop/replace (deletion was requested) — plus, transiently, a CONCURRENT
create's not-yet-committed directory, which vacuum spares via its
listdir-before-manifest ordering and age-grace window (see the method).

Portable hand-off (`export_catalog` / `import_catalog`) is a manifest of
manifests: each collection exports through core/portable.py (open
parquet + count + order-insensitive xxhash64-XOR fingerprint + tier
knobs) keyed by NAME (directory ids are an installation-local detail and
are regenerated on import), and the catalog-level manifest pins the
collection set so an import verifies BOTH every collection's content
fingerprint and that no collection was added/dropped/renamed in transit.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from oasysdb_spark import errors
from oasysdb_spark.core.config import atomic_write_text
from oasysdb_spark.core.database import Database

CATALOG_FILE = "catalog.json"
# /2 pins the id-indirected layout (required per-entry "dir" key +
# id-keyed data dirs + per-entry relevancy). The /1 tag was written in
# two incompatible shapes during r11 development (name-keyed dirs, then
# dir-keyed without relevancy), so /1 refuses cleanly at the format
# check rather than risking a KeyError or mis-shaped entry later; no
# /1 catalogs exist outside that window, hence no migration path.
CATALOG_FORMAT = "oasysdb-spark-catalog/2"
COLLECTIONS_SUBDIR = "collections"

CATALOG_SNAPSHOT_FILE = "catalog_manifest.json"
CATALOG_SNAPSHOT_FORMAT = "oasysdb-spark-catalog-snapshot/1"

# path-safe, shell-friendly, no dotfiles / traversal
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.-]{0,63}$")


def _check_name(name: str) -> str:
    if not isinstance(name, str) or not _NAME_RE.match(name):
        raise errors.InvalidArgumentError(
            f"invalid collection name {name!r}: must match "
            "[A-Za-z0-9][A-Za-z0-9_.-]{0,63} (letters, digits, '_', "
            "'.', '-'; no leading '.'; max 64 chars)"
        )
    return name


def _dir_id() -> str:
    return uuid.uuid4().hex[:12]


class Catalog:
    """A root directory of named collections, each a :class:`Database`.

    Restores the reference's multi-collection API surface
    (/root/reference/docs/changelog.md:350-368) in its Spark shape:
    `create_collection` / `save_collection` (create-or-replace, the
    v0.3 semantics) / `open_collection` (get) / `list_collections` /
    `drop_collection`, plus the name-indirection operations the
    lineage never had but a production catalog needs:
    `rename_collection`, `swap_collections` (atomic blue-green
    cut-over), `vacuum`.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    @classmethod
    def init(cls, spark: SparkSession, root: str,
             overwrite: bool = False) -> "Catalog":
        """Create an empty catalog at ``root``. Refuses to clobber an
        existing one unless ``overwrite`` (which drops every collection)."""
        manifest_path = os.path.join(root, CATALOG_FILE)
        if os.path.exists(manifest_path) and not overwrite:
            raise errors.InvalidArgumentError(
                f"catalog already initialised at {root}; pass overwrite=True"
            )
        coll_dir = os.path.join(root, COLLECTIONS_SUBDIR)
        cat = cls(spark, root)
        # empty manifest BEFORE the rmtree: a crash between the two
        # strands unreferenced dirs (vacuum-able), never manifest
        # entries whose directories are gone (r11 self-review). Both
        # steps run under the same manifest lock every other mutator
        # takes (r12 ADVICE): without it a concurrent _commit_entry
        # landing between them re-reads the empty manifest, commits its
        # entry, and the rmtree then deletes that entry's directory —
        # exactly the dangling state the ordering promise rules out. A
        # commit arriving AFTER init(overwrite=True) releases the lock
        # still loses its staged directory; that is the documented
        # overwrite semantic (init clobbers everything), not a race.
        os.makedirs(root, exist_ok=True)
        with cat._manifest_lock():
            # re-evaluate the refuse-to-clobber decision UNDER the lock
            # (r12 review): two concurrent inits both pass the unlocked
            # pre-check above; without this re-check the second one
            # silently erases whatever the first (plus any creates that
            # beat it to the lock) just committed
            if os.path.exists(manifest_path) and not overwrite:
                raise errors.InvalidArgumentError(
                    f"catalog already initialised at {root}; "
                    "pass overwrite=True"
                )
            cat._write_manifest({})
            if overwrite and os.path.isdir(coll_dir):
                shutil.rmtree(coll_dir)
            os.makedirs(coll_dir, exist_ok=True)
        return cat

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "Catalog":
        """Open an existing catalog (NotFoundError if none)."""
        if not os.path.exists(os.path.join(root, CATALOG_FILE)):
            raise errors.NotFoundError(
                f"no catalog at {root} (missing {CATALOG_FILE}); "
                "Catalog.init first"
            )
        return cls(spark, root)

    # ------------------------------------------------------------------
    # manifest helpers
    # ------------------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, CATALOG_FILE)

    @contextmanager
    def _manifest_lock(self):
        """Advisory flock serializing manifest READ-MODIFY-WRITE
        sections (and vacuum's list+delete) across processes on one
        machine — without it, two writers' re-reads can interleave and
        the loser's write silently erases the winner's committed entry
        (r11 review). Readers never take it (the manifest write is an
        atomic rename). flock is advisory and may be a no-op on some
        network filesystems — there, the vacuum grace window is the
        remaining cross-writer safeguard."""
        os.makedirs(self.root, exist_ok=True)
        fd = os.open(os.path.join(self.root, ".catalog.lock"),
                     os.O_CREAT | os.O_RDWR, 0o644)
        try:
            try:
                import fcntl

                fcntl.flock(fd, fcntl.LOCK_EX)
            except (ImportError, OSError):
                pass  # no flock here (platform/FS) — grace window only
            yield
        finally:
            os.close(fd)  # releases the flock

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path(), encoding="utf-8") as f:
                manifest = json.load(f)
        except FileNotFoundError:
            raise errors.NotFoundError(
                f"no catalog at {self.root} (missing {CATALOG_FILE})"
            ) from None
        if manifest.get("format") != CATALOG_FORMAT:
            raise errors.InvalidArgumentError(
                f"unsupported catalog format {manifest.get('format')!r} "
                f"(this engine reads {CATALOG_FORMAT})"
            )
        return manifest["collections"]

    def _write_manifest(self, collections: dict) -> None:
        atomic_write_text(
            self._manifest_path(),
            json.dumps(
                {"format": CATALOG_FORMAT, "collections": collections},
                sort_keys=True,
            ),
        )

    def _dir_path(self, dir_id: str) -> str:
        return os.path.join(self.root, COLLECTIONS_SUBDIR, dir_id)

    def _entry(self, collections: dict, name: str) -> dict:
        _check_name(name)
        if name not in collections:
            raise errors.NotFoundError(f"no collection named {name!r}")
        return collections[name]

    # ------------------------------------------------------------------
    # collection CRUD
    # ------------------------------------------------------------------

    def _commit_entry(self, name: str, dir_id: str, params: dict,
                      require_absent: bool = False) -> None:
        """The shared commit step for create/save/import: RE-READ the
        manifest at commit time (never write back a snapshot taken
        before a potentially long load — a concurrent create/drop
        landing in between would be silently clobbered, r11 review),
        repoint ``name`` in one atomic write, then LEAVE the displaced
        directory for vacuum. Deleting it here yanked parquet files out
        from under any reader that resolved the old dir id just before
        the repoint (r12 ADVICE); instead the dir is touched (so the
        vacuum staleness clock starts at displacement, not at its last
        data write) and reclaimed by the next ``vacuum`` after its
        grace window — in-flight readers get the same grace as
        interrupted-create residue. ``require_absent`` turns an
        existing name into the typed duplicate error (the
        create-without-overwrite contract)."""
        with self._manifest_lock():
            collections = self._read_manifest()
            old = collections.get(name)
            if old is not None and require_absent:
                raise errors.InvalidArgumentError(
                    f"collection {name!r} already exists; pass overwrite=True"
                )
            collections[name] = {**params, "dir": dir_id}
            self._write_manifest(collections)
        if old is not None and os.path.isdir(self._dir_path(old["dir"])):
            try:
                os.utime(self._dir_path(old["dir"]))
            except OSError:
                pass  # grace clock falls back to the last write mtime

    def create_collection(
        self,
        name: str,
        dimension: int,
        metric: str = "euclidean",
        density: int = 256,
        relevancy: float = -1.0,
        overwrite: bool = False,
    ) -> Database:
        """Create an empty named collection with its OWN parameters
        (the catalog's point: per-collection dimension/metric/density,
        /root/reference/docs/changelog.md:362-363). With ``overwrite``
        an existing name is REPLACED: the new directory is configured
        first, then one atomic manifest write repoints the name — a
        reader sees the old collection or the new one, never neither —
        and only then is the old directory deleted."""
        _check_name(name)
        # early duplicate check (cheap, before the configure work);
        # re-verified atomically inside _commit_entry
        if not overwrite and name in self._read_manifest():
            raise errors.InvalidArgumentError(
                f"collection {name!r} already exists; pass overwrite=True"
            )
        dir_id = _dir_id()
        db = Database.configure(
            self.spark, self._dir_path(dir_id),
            dimension=dimension, metric=metric, density=density,
            relevancy=relevancy,
        )
        self._commit_entry(
            name, dir_id,
            {"dimension": dimension, "metric": metric, "density": density,
             "relevancy": relevancy},
            require_absent=not overwrite,
        )
        return db

    def create_collection_from_jdbc(
        self,
        name: str,
        url: str,
        table: str,
        overwrite: bool = False,
        **from_jdbc_kwargs,
    ) -> Database:
        """Bulk-load a named collection from a SQL table in one call —
        the blue-green SQL-rebuild composition: the load and index
        build run into an UNREFERENCED directory; one atomic manifest
        write publishes the name only after they succeed (a failed load
        leaves the existing collection untouched, its residue
        vacuum-able). Accepts every :meth:`Database.from_jdbc` keyword
        (dimension/vector_col/where/partition bounds/...). The standard
        zero-downtime reindex stays: load under a staging name, then
        :meth:`swap_collections`."""
        _check_name(name)
        if not overwrite and name in self._read_manifest():
            raise errors.InvalidArgumentError(
                f"collection {name!r} already exists; pass overwrite=True"
            )
        dir_id = _dir_id()
        db = Database.from_jdbc(
            self.spark, self._dir_path(dir_id), url, table,
            **from_jdbc_kwargs,
        )
        self._commit_entry(
            name, dir_id,
            {"dimension": db.params.dimension, "metric": db.params.metric,
             "density": db.params.density,
             "relevancy": db.params.relevancy},
            require_absent=not overwrite,
        )
        return db

    def save_collection(
        self,
        name: str,
        records: DataFrame,
        dimension: int,
        metric: str = "euclidean",
        density: int = 256,
        relevancy: float = -1.0,
    ) -> Database:
        """Create-or-replace a collection from a records DataFrame —
        the v0.3 `save_collection` semantics ("create a new collection
        or update an existing one" by whole-collection replacement,
        /root/reference/docs/changelog.md:350-368). The records load
        runs into a fresh unreferenced directory BEFORE the name
        repoints (blue-green in miniature): a failed load leaves the
        existing collection untouched — only vacuum-able residue — and
        readers atomically see the old collection until the new one is
        fully loaded. The manifest is re-read at commit time, so
        catalog changes landing DURING a long load are not clobbered."""
        _check_name(name)
        self._read_manifest()  # fail on a missing/mis-formatted catalog
        # BEFORE the expensive load, not after it (r11 review)
        dir_id = _dir_id()
        db = Database.configure(
            self.spark, self._dir_path(dir_id),
            dimension=dimension, metric=metric, density=density,
            relevancy=relevancy,
        )
        db.insert_batch(records)  # fails ⇒ old data never touched
        self._commit_entry(
            name, dir_id,
            {"dimension": dimension, "metric": metric, "density": density,
             "relevancy": relevancy},
        )
        return db

    def open_collection(self, name: str) -> Database:
        """Open a named collection (the `get_collection` analog)."""
        entry = self._entry(self._read_manifest(), name)
        return Database.open(self.spark, self._dir_path(entry["dir"]))

    def list_collections(self, counts: bool = False) -> list[dict]:
        """Sorted collection listing: name + Parameters, plus the record
        count when ``counts=True`` (a Spark job per collection)."""
        out = []
        for name, entry in sorted(self._read_manifest().items()):
            row = {"name": name,
                   **{k: v for k, v in entry.items() if k != "dir"}}
            if counts:
                row["n_records"] = Database.open(
                    self.spark, self._dir_path(entry["dir"])
                ).count()
            out.append(row)
        return out

    def drop_collection(self, name: str) -> None:
        """Drop a named collection and delete its directory
        (NotFoundError if absent). Manifest entry goes first so a crash
        strands an unreferenced dir (vacuum-able), never a dangling
        entry.

        Drop deletes EAGERLY — it is the explicit destructive verb, and
        an open reader of the dropped collection loses its files
        mid-query. When readers may be in flight, rename the collection
        aside (or swap in the replacement) and let ``vacuum``'s grace
        window reclaim it instead; create/save with overwrite already
        defer the displaced directory that way (r12 ADVICE)."""
        with self._manifest_lock():
            collections = self._read_manifest()
            entry = self._entry(collections, name)
            del collections[name]
            self._write_manifest(collections)
        directory = self._dir_path(entry["dir"])
        if os.path.isdir(directory):
            shutil.rmtree(directory)

    # ------------------------------------------------------------------
    # atomic name operations (one manifest write each)
    # ------------------------------------------------------------------

    def rename_collection(self, name: str, to: str) -> None:
        """Atomically rename a collection: one manifest write, no data
        movement (the directory id travels with the entry)."""
        _check_name(to)
        with self._manifest_lock():
            collections = self._read_manifest()
            entry = self._entry(collections, name)
            if to in collections:
                raise errors.InvalidArgumentError(
                    f"collection {to!r} already exists; drop it or swap instead"
                )
            del collections[name]
            collections[to] = entry
            self._write_manifest(collections)

    def swap_collections(self, a: str, b: str) -> None:
        """Atomically exchange two collection names — parameters and
        data travel together, readers see pre-swap or post-swap and
        nothing in between. THE blue-green reindex primitive: build the
        re-encoded/re-indexed copy under a staging name, swap it with
        the live name, drop the staging name (now holding the old
        data). One manifest write; no bytes move."""
        with self._manifest_lock():
            collections = self._read_manifest()
            ea, eb = self._entry(collections, a), self._entry(collections, b)
            collections[a], collections[b] = eb, ea
            self._write_manifest(collections)

    def vacuum(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Delete unreferenced collection directories (crash residue
        from an interrupted create/drop/replace). Returns the removed
        directory ids.

        Safeguards against racing a CONCURRENT writer (r11 review):
        the whole list+delete runs under the advisory manifest lock,
        so a same-machine commit cannot interleave between the
        reference-set read and the deletes; the directory listing is
        taken BEFORE the manifest read (a create committing in between
        is spared by the newer reference set — the cross-machine
        fallback where flock is a no-op); only residue whose NEWEST
        internal activity (any file or directory mtime in the tree —
        an in-flight load keeps writing files, and the scan
        short-circuits at the first young entry, so live loads cost
        O(1)) is older than ``min_age_seconds`` is touched; and a
        directory vanishing mid-removal is skipped, not an error. Run
        with the default grace unless no concurrent writer can exist
        (e.g. tests: ``min_age_seconds=0``)."""
        import time

        coll_root = os.path.join(self.root, COLLECTIONS_SUBDIR)
        removed = []
        with self._manifest_lock():
            listing = sorted(os.listdir(coll_root)) if os.path.isdir(coll_root) else []
            referenced = {e["dir"] for e in self._read_manifest().values()}
            now = time.time()
            for d in listing:
                path = os.path.join(coll_root, d)
                # skip stray plain files (not ours to delete) and
                # anything the (newer) manifest references
                if d in referenced or not os.path.isdir(path):
                    continue
                if not self._residue_is_stale(path, now, min_age_seconds):
                    continue
                try:
                    shutil.rmtree(path)
                except FileNotFoundError:
                    continue  # a concurrent drop/vacuum won the race
                removed.append(d)
        return removed

    @staticmethod
    def _residue_is_stale(path: str, now: float, grace: float) -> bool:
        """True when NOTHING in the tree (dirs or files) was touched
        within ``grace`` seconds — short-circuits at the first young
        entry, so probing an actively-writing load is O(1)."""
        try:
            if now - os.path.getmtime(path) < grace:
                return False
            for sub_root, dirs, files in os.walk(path):
                for entry in dirs + files:
                    if now - os.path.getmtime(
                        os.path.join(sub_root, entry)
                    ) < grace:
                        return False
        except OSError:
            return False  # vanished/changing concurrently — spare it
        return True


# ----------------------------------------------------------------------
# portable hand-off: manifest of manifests
# ----------------------------------------------------------------------


def export_catalog(catalog: Catalog, out_dir: str,
                   overwrite: bool = False) -> dict:
    """Export every collection as a portable snapshot under
    ``out_dir/collections/<name>/`` plus a catalog-level manifest
    pinning the collection SET (names + per-collection record counts +
    fingerprints). Snapshot subdirectories are keyed by NAME, not by
    the installation-local directory id. Returns the catalog manifest."""
    from oasysdb_spark.core.portable import export_db

    manifest_path = os.path.join(out_dir, CATALOG_SNAPSHOT_FILE)
    if os.path.exists(manifest_path) and not overwrite:
        raise errors.InvalidArgumentError(
            f"{out_dir} already holds a catalog snapshot "
            "(pass overwrite=True / --overwrite to replace it)"
        )
    # under overwrite, clear per-collection snapshots from the PREVIOUS
    # export first: a collection dropped since then would otherwise
    # survive on disk and make import_catalog's collection-set check
    # refuse the tool's own output as tampered (r11 self-review)
    sub_root = os.path.join(out_dir, COLLECTIONS_SUBDIR)
    if overwrite and os.path.isdir(sub_root):
        shutil.rmtree(sub_root)
    collections = {}
    for name in sorted(catalog._read_manifest()):
        db = catalog.open_collection(name)
        sub = export_db(
            db, os.path.join(out_dir, COLLECTIONS_SUBDIR, name),
            overwrite=overwrite,
        )
        collections[name] = {
            "n_records": sub["n_records"],
            "fingerprint_xxh64_xor": sub["fingerprint_xxh64_xor"],
            "parameters": sub["parameters"],
        }
    manifest = {
        "format": CATALOG_SNAPSHOT_FORMAT,
        "n_collections": len(collections),
        "collections": collections,
    }
    atomic_write_text(manifest_path, json.dumps(manifest, sort_keys=True))
    return manifest


def import_catalog(
    spark: SparkSession,
    in_dir: str,
    dest_root: str,
    rebuild_indexes: bool = True,
    overwrite: bool = False,
    verify: bool = True,
) -> Catalog:
    """Import a catalog snapshot into a NEW catalog at ``dest_root``.

    Verifies the collection SET against the catalog manifest (a missing
    or extra per-collection snapshot directory refuses before any
    import runs), then imports each collection through
    :func:`core.portable.import_db` — which re-verifies each
    collection's count + fingerprint and rebuilds its recorded index
    tiers. Directory ids are regenerated locally. Returns the opened
    :class:`Catalog`.
    """
    from oasysdb_spark.core.portable import MANIFEST_FILE, import_db

    manifest_path = os.path.join(in_dir, CATALOG_SNAPSHOT_FILE)
    if not os.path.exists(manifest_path):
        raise errors.NotFoundError(
            f"{in_dir} is not a catalog snapshot (no {CATALOG_SNAPSHOT_FILE})"
        )
    with open(manifest_path, encoding="utf-8") as f:
        manifest = json.load(f)
    if manifest.get("format") != CATALOG_SNAPSHOT_FORMAT:
        raise errors.InvalidArgumentError(
            f"unsupported catalog snapshot format {manifest.get('format')!r} "
            f"(this engine reads {CATALOG_SNAPSHOT_FORMAT})"
        )
    expected = set(manifest["collections"])
    # snapshot manifests are untrusted input (r12 ADVICE): validate every
    # name BEFORE any path join or manifest commit, regardless of the
    # verify flag — a crafted name like '../x' would otherwise traverse
    # out of the snapshot on read, and an invalid committed name becomes
    # a stuck manifest entry (open/drop _check_name first and refuse
    # before lookup)
    for name in sorted(expected):
        _check_name(name)
    sub_root = os.path.join(in_dir, COLLECTIONS_SUBDIR)
    present = {
        d for d in (os.listdir(sub_root) if os.path.isdir(sub_root) else [])
        if os.path.exists(os.path.join(sub_root, d, MANIFEST_FILE))
    }
    if verify and present != expected:
        raise errors.InvalidArgumentError(
            "catalog snapshot failed verification: manifest lists "
            f"collections {sorted(expected)} but the snapshot holds "
            f"{sorted(present)} — a collection was added, dropped or "
            "renamed in transit; re-export or pass verify=False"
        )
    cat = Catalog.init(spark, dest_root, overwrite=overwrite)
    for name in sorted(expected):
        dir_id = _dir_id()
        db = import_db(
            spark,
            os.path.join(sub_root, name),
            cat._dir_path(dir_id),
            rebuild_indexes=rebuild_indexes,
            verify=verify,
        )
        # per-collection manifest commit: already-imported collections
        # stay listed/openable if a later one fails. A crashed import
        # is restarted with overwrite=True (import_db rebuilds tiers,
        # so partial re-import cannot be verified cheaper than redone).
        cat._commit_entry(name, dir_id, {
            "dimension": db.params.dimension,
            "metric": db.params.metric,
            "density": db.params.density,
            "relevancy": db.params.relevancy,
        })
    return cat
