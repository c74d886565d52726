"""Persistent, versioned registry over a plain directory of parquet + JSON.

Mirrors the SEMANTICS of the reference registry
(dsgrid/registry/registry_manager.py:558 register flows,
registry_database.py:431 get_latest_version, versioning.py:92 version
bumps, registration log at registry_database.py:498) without the
SQLAlchemy machinery: the registry IS the filesystem, so it works the
same on a laptop and on a 1000-executor cluster whose object store the
path points at. Spark never lists the tree — only the tiny JSON index is
read at open, and parquet paths are handed to readers lazily.

Layout::

    <root>/registry.json                      # index: versions + log
    <root>/datasets/<id>/<version>/table.parquet/
                                   [lookup.parquet/]
                                   config.json
    <root>/dimensions/<name>/<version>/records.parquet/
    <root>/mappings/<name>/<version>/records.parquet/
                                     config.json

Versions are semver strings; registering starts at 1.0.0 and updates bump
major/minor/patch (reference VersionUpdateType). Data directories are
immutable once written — an update writes a NEW version directory, so
readers of the old version (including cached query results keyed on it)
stay consistent.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import time
from contextlib import contextmanager
from dataclasses import dataclass
from enum import Enum
from pathlib import Path
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession

from dsgrid_spark.datasets.handlers import DatasetConfig
from dsgrid_spark.sources.catalog import Catalog

KINDS = ("datasets", "dimensions", "mappings", "projects")


class VersionUpdateType(str, Enum):
    """Reference dsgrid/registry/common.py VersionUpdateType."""

    MAJOR = "major"
    MINOR = "minor"
    PATCH = "patch"


def bump_version(version: str, update_type: VersionUpdateType) -> str:
    """Semver bump (reference versioning.py:83-92)."""
    major, minor, patch = (int(x) for x in version.split("."))
    if update_type == VersionUpdateType.MAJOR:
        return f"{major + 1}.0.0"
    if update_type == VersionUpdateType.MINOR:
        return f"{major}.{minor + 1}.0"
    return f"{major}.{minor}.{patch + 1}"


class RegistryError(ValueError):
    pass


def as_dataframe(spark: SparkSession, source) -> DataFrame:
    """Resolve a Source (DataFrame | path | callable) to a DataFrame."""
    if isinstance(source, DataFrame):
        return source
    if callable(source):
        return source(spark)
    from dsgrid_spark.sources.readers import read_file

    return read_file(spark, Path(source))


@dataclass
class RegistryStore:
    root: Path
    spark: SparkSession

    def __post_init__(self):
        self.root = Path(self.root)
        self._lock_depth = 0

    # ---- concurrency / atomicity ---------------------------------------
    @contextmanager
    def _locked(self, timeout: float = 60.0):
        """Serialize registry mutations across processes via an advisory
        flock on <root>/.registry.lock (reference serializes through a
        registry database transaction, registry_database.py). Re-entrant
        within an instance so update_* can call register_*."""
        if self._lock_depth:
            self._lock_depth += 1
            try:
                yield
            finally:
                self._lock_depth -= 1
            return
        import fcntl

        self.root.mkdir(parents=True, exist_ok=True)
        fd = os.open(str(self.root / ".registry.lock"), os.O_CREAT | os.O_RDWR)
        try:
            deadline = time.monotonic() + timeout
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    if time.monotonic() >= deadline:
                        raise RegistryError(
                            "timed out waiting for the registry lock")
                    time.sleep(0.1)
            self._lock_depth = 1
            try:
                yield
            finally:
                self._lock_depth = 0
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    @contextmanager
    def _staged(self, kind: str, entity_id: str, version: str):
        """Stage a version directory: write into .staging-<version>, then
        rename into place only after every write succeeded. A crash
        mid-registration leaves only a staging dir (cleared on retry),
        never a half-written version dir that would block re-registration
        of the same version."""
        final = self._entry_dir(kind, entity_id, version)
        tmp = final.parent / f".staging-{version}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        try:
            yield tmp
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        if final.exists():
            # orphan from a crashed run: the version never reached the
            # index (_assert_version_free passed), so the dir is garbage
            shutil.rmtree(final)
        tmp.replace(final)

    def _assert_version_free(self, kind: str, entity_id: str, version: str,
                             index: dict) -> None:
        entry = index[kind].get(entity_id)
        if entry and version in [e["version"] for e in entry["log"]]:
            raise RegistryError(f"{kind}/{entity_id}@{version} already exists")

    def prune(self, keep_versions: Optional[int] = None) -> dict[str, list[str]]:
        """Garbage-collect the registry tree: staging leftovers from
        crashed registrations, version dirs the index never acknowledged
        (orphans), and — with ``keep_versions`` — all but the newest N
        data dirs per entity (the current version is always kept). The
        registration log keeps full history either way; pruned versions
        can no longer be loaded or pinned. Returns the removed paths by
        category."""
        removed: dict[str, list[str]] = {"staging": [], "orphans": [],
                                         "old_versions": []}

        def _semver_key(v: str):
            return tuple(int(x) for x in v.split("."))

        with self._locked():
            index = self._read_index()
            for kind in KINDS:
                kind_dir = self.root / kind
                if not kind_dir.exists():
                    continue
                for ent_dir in sorted(kind_dir.iterdir()):
                    if not ent_dir.is_dir():
                        continue
                    entry = index[kind].get(ent_dir.name)
                    known = ([e["version"] for e in entry["log"]]
                             if entry else [])
                    for vdir in sorted(ent_dir.iterdir()):
                        if not vdir.is_dir():
                            continue
                        if vdir.name.startswith(".staging-"):
                            shutil.rmtree(vdir)
                            removed["staging"].append(str(vdir))
                        elif vdir.name not in known:
                            shutil.rmtree(vdir)
                            removed["orphans"].append(str(vdir))
                    if entry and keep_versions is not None:
                        keep = set(sorted(known, key=_semver_key)[-keep_versions:])
                        keep.add(entry["current"])
                        # an alias version has no dir of its own — keep
                        # the data dir it resolves to alive instead
                        for v in list(keep):
                            keep.add(self._data_version_of(entry, v))
                        for v in known:
                            vdir = ent_dir / v
                            if v not in keep and vdir.exists():
                                shutil.rmtree(vdir)
                                removed["old_versions"].append(str(vdir))
        return removed

    def remove(self, kind: str, entity_id: str) -> None:
        """Remove an entity entirely — index entry, log, and every version
        data dir (reference dsgrid_admin.py remove commands). Destructive
        and deliberate: version history is gone; prefer ``prune`` to
        reclaim space while keeping the log."""
        if kind not in KINDS:
            raise RegistryError(f"unknown kind {kind!r}")
        with self._locked():
            index = self._read_index()
            if entity_id not in index[kind]:
                raise RegistryError(f"{kind}/{entity_id} is not registered")
            del index[kind][entity_id]
            self._write_index(index)
            ent_dir = self.root / kind / entity_id
            if ent_dir.exists():
                shutil.rmtree(ent_dir)

    def download(self, kind: str, entity_id: str, dest: Union[str, Path],
                 version: Optional[str] = None) -> Path:
        """Copy one version's data directory out of the registry
        (reference cli/download.py): the parquet + config land under
        ``dest/<kind>/<id>/<version>`` ready to register elsewhere or
        read directly. Returns the copied path."""
        version = version or self.latest_version(kind, entity_id)
        src = self._data_dir(kind, entity_id, version)
        if not src.exists():
            raise RegistryError(
                f"{kind}/{entity_id}@{version} has no data directory "
                "(pruned?)")
        out = Path(dest) / kind / entity_id / version
        if out.exists():
            raise RegistryError(f"destination {out} already exists")
        out.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src, out)
        return out

    # ---- index ---------------------------------------------------------
    @property
    def _index_path(self) -> Path:
        return self.root / "registry.json"

    def _read_index(self) -> dict:
        if self._index_path.exists():
            index = json.loads(self._index_path.read_text())
            for k in KINDS:
                index.setdefault(k, {})
            return index
        return {k: {} for k in KINDS}

    def _write_index(self, index: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        tmp = self._index_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(index, indent=2, sort_keys=True))
        tmp.replace(self._index_path)  # atomic on POSIX

    # ---- generic register/update ---------------------------------------
    def _entry_dir(self, kind: str, entity_id: str, version: str) -> Path:
        return self.root / kind / entity_id / version

    def _write_df(self, df_or_path, out: Path, name: str) -> None:
        out.mkdir(parents=True, exist_ok=True)
        target = out / name
        # normalize path/callable sources through one read → the stored
        # table is always parquet regardless of input format
        as_dataframe(self.spark, df_or_path).write.mode("error").parquet(
            str(target)
        )

    def _register(self, kind: str, entity_id: str, version: str,
                  submitter: str, message: str, index: dict) -> None:
        entry = index[kind].setdefault(entity_id, {"current": None, "log": []})
        if version in [e["version"] for e in entry["log"]]:
            raise RegistryError(f"{kind}/{entity_id}@{version} already exists")
        entry["current"] = version
        entry["log"].append({
            "version": version,
            "submitter": submitter,
            "message": message,
            "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
        })
        self._write_index(index)

    def _next_version(self, kind: str, entity_id: str,
                      update_type: VersionUpdateType, index: dict) -> str:
        entry = index[kind].get(entity_id)
        if entry is None or entry["current"] is None:
            raise RegistryError(
                f"{kind}/{entity_id} is not registered; register it first"
            )
        return bump_version(entry["current"], update_type)

    # ---- entity metadata -------------------------------------------------
    def set_meta(self, kind: str, entity_id: str, key: str, value) -> None:
        """Set a small JSON-serializable metadata value on a registered
        entity. Lives in the index (one JSON read/write under the
        registry lock, no Spark job, no data dir touched) — the home for
        operational state like a streaming ingest's high-watermark."""
        with self._locked():
            index = self._read_index()
            entry = index[kind].get(entity_id)
            if entry is None:
                raise RegistryError(f"{kind}/{entity_id} is not registered")
            entry.setdefault("meta", {})[key] = value
            self._write_index(index)

    def get_meta(self, kind: str, entity_id: str, key: str, default=None):
        """Read a metadata value set by :meth:`set_meta` (index-only)."""
        entry = self._read_index()[kind].get(entity_id)
        if entry is None:
            raise RegistryError(f"{kind}/{entity_id} is not registered")
        return entry.get("meta", {}).get(key, default)

    # ---- version aliasing ------------------------------------------------
    @staticmethod
    def _data_version_of(entry: Optional[dict], version: str) -> str:
        """Resolve an alias version to the version whose data dir holds
        its rows (identity for normal versions). Alias chains collapse at
        creation time, so one hop suffices."""
        if entry:
            for e in entry["log"]:
                if e["version"] == version:
                    return e.get("alias_of", version)
        return version

    def _data_dir(self, kind: str, entity_id: str, version: str,
                  index: Optional[dict] = None) -> Path:
        index = index if index is not None else self._read_index()
        dv = self._data_version_of(index[kind].get(entity_id), version)
        return self._entry_dir(kind, entity_id, dv)

    def alias_version(self, kind: str, entity_id: str,
                      update_type: VersionUpdateType = VersionUpdateType.MAJOR,
                      submitter: str = "", message: str = "") -> str:
        """METADATA-ONLY version bump: register a new current version
        whose data directory is the present current version's — nothing
        is copied or re-written (VERDICT r5 item 7: aligning version
        counters by re-registering identical frames wrote full dataset
        copies just to advance a counter). The log entry records
        ``alias_of`` so readers, download, prune, and sync resolve to the
        real data dir; chains collapse (an alias of an alias records the
        original data version)."""
        with self._locked():
            index = self._read_index()
            entry = index[kind].get(entity_id)
            if entry is None or entry["current"] is None:
                raise RegistryError(f"{kind}/{entity_id} is not registered")
            cur = entry["current"]
            new = bump_version(cur, update_type)
            self._assert_version_free(kind, entity_id, new, index)
            data_v = self._data_version_of(entry, cur)
            entry["current"] = new
            entry["log"].append({
                "version": new,
                "submitter": submitter,
                "message": message or f"alias of {data_v}",
                "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
                "alias_of": data_v,
            })
            self._write_index(index)
            return new

    # ---- datasets ------------------------------------------------------
    def register_dataset(self, dataset_id: str, source,
                         config: Optional[DatasetConfig] = None,
                         lookup_source=None, submitter: str = "",
                         message: str = "initial registration",
                         validate: bool = True,
                         dimension_names: Optional[list[str]] = None,
                         _version: str = "1.0.0") -> str:
        """Register a dataset; returns the new version.

        ``validate=True`` runs the registration gauntlet (reference
        dataset_schema_handler_base.py:323-452) BEFORE anything is
        written — an invalid dataset never enters the registry.
        ``dimension_names`` optionally names registered dimensions whose
        record ids the dataset's columns must match.
        """
        with self._locked():
            index = self._read_index()
            if dataset_id in index["datasets"] and _version == "1.0.0":
                raise RegistryError(
                    f"datasets/{dataset_id} already registered; use update_dataset"
                )
            self._assert_version_free("datasets", dataset_id, _version, index)
            config = config or DatasetConfig(dataset_id=dataset_id)
            if validate:
                from dsgrid_spark.registry.validation import validate_dataset

                validate_dataset(self.spark, source, config,
                                 lookup_source=lookup_source,
                                 dimension_records={
                                     n: self.load_dimension(n)
                                     for n in (dimension_names or [])
                                 })
            with self._staged("datasets", dataset_id, _version) as out:
                self._write_df(source, out, "table.parquet")
                if lookup_source is not None:
                    self._write_df(lookup_source, out, "lookup.parquet")
                (out / "config.json").write_text(
                    config.model_dump_json(indent=2))
            self._register("datasets", dataset_id, _version, submitter,
                           message, index)
            return _version

    def update_dataset(self, dataset_id: str, source,
                       config: Optional[DatasetConfig] = None,
                       lookup_source=None,
                       update_type: VersionUpdateType = VersionUpdateType.MAJOR,
                       submitter: str = "", message: str = "",
                       validate: bool = True,
                       dimension_names: Optional[list[str]] = None) -> str:
        with self._locked():
            index = self._read_index()
            version = self._next_version("datasets", dataset_id, update_type,
                                         index)
            return self.register_dataset(
                dataset_id, source, config=config, lookup_source=lookup_source,
                submitter=submitter, message=message or f"update to {version}",
                validate=validate, dimension_names=dimension_names,
                _version=version,
            )

    # ---- dimensions ----------------------------------------------------
    def register_dimension(self, name: str, source, submitter: str = "",
                           message: str = "initial registration",
                           _version: str = "1.0.0") -> str:
        with self._locked():
            index = self._read_index()
            if name in index["dimensions"] and _version == "1.0.0":
                raise RegistryError(
                    f"dimensions/{name} already registered; use update_dimension"
                )
            self._assert_version_free("dimensions", name, _version, index)
            with self._staged("dimensions", name, _version) as out:
                self._write_df(source, out, "records.parquet")
            self._register("dimensions", name, _version, submitter, message,
                           index)
            return _version

    def update_dimension(self, name: str, source,
                         update_type: VersionUpdateType = VersionUpdateType.MAJOR,
                         submitter: str = "", message: str = "") -> str:
        with self._locked():
            index = self._read_index()
            version = self._next_version("dimensions", name, update_type,
                                         index)
            return self.register_dimension(
                name, source, submitter=submitter,
                message=message or f"update to {version}", _version=version,
            )

    # ---- mappings ------------------------------------------------------
    def register_mapping(self, name: str, source,
                         from_dimension: Optional[str] = None,
                         to_dimension: Optional[str] = None,
                         mapping_type: Optional[str] = None,
                         submitter: str = "",
                         message: str = "initial registration",
                         validate: bool = True,
                         _version: str = "1.0.0") -> str:
        with self._locked():
            index = self._read_index()
            if name in index["mappings"] and _version == "1.0.0":
                raise RegistryError(
                    f"mappings/{name} already registered; use update_mapping"
                )
            self._assert_version_free("mappings", name, _version, index)
            if validate and mapping_type is not None:
                from dsgrid_spark.dimensions import DimensionMappingType
                from dsgrid_spark.operators.mapping import check_mapping_fractions

                check_mapping_fractions(as_dataframe(self.spark, source),
                                        DimensionMappingType(mapping_type))
            with self._staged("mappings", name, _version) as out:
                self._write_df(source, out, "records.parquet")
                (out / "config.json").write_text(json.dumps({
                    "from_dimension": from_dimension,
                    "to_dimension": to_dimension,
                    "mapping_type": mapping_type,
                }, indent=2))
            self._register("mappings", name, _version, submitter, message,
                           index)
            return _version

    def update_mapping(self, name: str, source,
                       update_type: VersionUpdateType = VersionUpdateType.MAJOR,
                       submitter: str = "", message: str = "",
                       validate: bool = True) -> str:
        with self._locked():
            index = self._read_index()
            version = self._next_version("mappings", name, update_type, index)
            cfg = json.loads(
                (self._data_dir("mappings", name,
                                index["mappings"][name]["current"],
                                index=index)
                 / "config.json").read_text()
            )
            return self.register_mapping(
                name, source, from_dimension=cfg.get("from_dimension"),
                to_dimension=cfg.get("to_dimension"),
                mapping_type=cfg.get("mapping_type"),
                submitter=submitter, message=message or f"update to {version}",
                validate=validate, _version=version,
            )

    # ---- projects ------------------------------------------------------
    def register_project(self, config, submitter: str = "",
                         message: str = "initial registration",
                         _version: str = "1.0.0") -> str:
        """Register a ProjectConfig (reference
        project_registry_manager.py register flow — config only; the
        datasets/dimensions/mappings it names register separately)."""
        with self._locked():
            index = self._read_index()
            if config.project_id in index["projects"] and _version == "1.0.0":
                raise RegistryError(
                    f"projects/{config.project_id} already registered; "
                    "use update_project"
                )
            self._assert_version_free("projects", config.project_id, _version,
                                      index)
            with self._staged("projects", config.project_id, _version) as out:
                (out / "config.json").write_text(
                    config.model_dump_json(indent=2))
            self._register("projects", config.project_id, _version, submitter,
                           message, index)
            return _version

    def update_project(self, config,
                       update_type: VersionUpdateType = VersionUpdateType.MAJOR,
                       submitter: str = "", message: str = "") -> str:
        with self._locked():
            index = self._read_index()
            version = self._next_version("projects", config.project_id,
                                         update_type, index)
            return self.register_project(
                config, submitter=submitter,
                message=message or f"update to {version}", _version=version,
            )

    def load_project(self, project_id: str, version: Optional[str] = None):
        from dsgrid_spark.query.project import ProjectConfig

        version = version or self.latest_version("projects", project_id)
        return ProjectConfig.model_validate_json(
            (self._data_dir("projects", project_id, version)
             / "config.json").read_text()
        )

    # ---- lookup --------------------------------------------------------
    def list_ids(self, kind: str) -> list[str]:
        return sorted(self._read_index()[kind])

    def latest_version(self, kind: str, entity_id: str) -> str:
        entry = self._read_index()[kind].get(entity_id)
        if entry is None:
            raise RegistryError(f"{kind}/{entity_id} is not registered")
        return entry["current"]

    def log(self, kind: str, entity_id: str) -> list[dict]:
        """Registration history (reference registry_database.py:498)."""
        entry = self._read_index()[kind].get(entity_id)
        if entry is None:
            raise RegistryError(f"{kind}/{entity_id} is not registered")
        return list(entry["log"])

    def load_dimension(self, name: str,
                       version: Optional[str] = None) -> DataFrame:
        version = version or self.latest_version("dimensions", name)
        return self.spark.read.parquet(
            str(self._data_dir("dimensions", name, version) / "records.parquet")
        )

    # ---- sync ----------------------------------------------------------
    def sync_to(self, dst: "RegistryStore",
                only: Optional[list[str]] = None,
                lock_timeout: float = 30.0) -> list[str]:
        """One-way mirror of this registry into ``dst`` (reference
        registry sync, filesystem level): version data dirs present here
        but absent there are copied, their log entries appended, and
        ``current`` pointers updated to match this side. Idempotent —
        a second sync copies nothing. Version dirs are immutable, so an
        existing dst version is never touched; dst-only entities/versions
        are preserved (mirror adds, never deletes).

        ``only`` restricts the mirror to ``"kind/entity_id"`` selectors
        (e.g. ``["datasets/load"]``) — syncing into a fresh root with a
        selector is the reference's ``make-filtered-registry``
        (dsgrid_admin.py:69): a trimmed registry carrying just the
        entities a downstream team needs.

        Copies go through the filesystem interface of the dst root;
        cross-scheme replication (local → s3a) is a bulk-transfer job
        (distcp), deliberately out of scope.

        Concurrency: the dst is guarded by BOTH the same-host flock and a
        uuid+TTL lock file written through its filesystem interface
        (registry/locking.py; reference cloud/s3_storage_interface.py
        lock files) — two writers mirroring into one object-store root
        serialize on the lock file, and a writer that cannot acquire it
        fails cleanly instead of interleaving index writes.
        """
        from dsgrid_spark.filesystem import filesystem_for
        from dsgrid_spark.registry.locking import registry_lock

        fs = filesystem_for(self.spark, str(dst.root))
        copied: list[str] = []
        with dst._locked(), registry_lock(fs, str(dst.root),
                                          timeout_seconds=lock_timeout):
            src_index = self._read_index()
            dst_index = dst._read_index()
            for kind in KINDS:
                for entity_id, entry in src_index[kind].items():
                    if only is not None and f"{kind}/{entity_id}" not in only:
                        continue
                    dst_entry = dst_index[kind].setdefault(
                        entity_id, {"current": None, "log": []})
                    have = {e["version"] for e in dst_entry["log"]}
                    for log_entry in entry["log"]:
                        v = log_entry["version"]
                        if v in have:
                            continue
                        if "alias_of" in log_entry:
                            # metadata-only version: no data dir to copy —
                            # its target copies via its own log entry
                            dst_entry["log"].append(dict(log_entry))
                            copied.append(f"{kind}/{entity_id}@{v} (alias)")
                            continue
                        src_dir = self._entry_dir(kind, entity_id, v)
                        if not src_dir.exists():
                            continue  # pruned at src; log stays src-only
                        dst_dir = dst._entry_dir(kind, entity_id, v)
                        if fs.exists(str(dst_dir)):
                            fs.rm_tree(str(dst_dir))  # orphan from a crash
                        fs.copy_tree(str(src_dir), str(dst_dir))
                        dst_entry["log"].append(dict(log_entry))
                        copied.append(f"{kind}/{entity_id}@{v}")
                    if entry["current"] is not None:
                        dst_entry["current"] = entry["current"]
            dst._write_index(dst_index)
        return copied

    # ---- catalog bridge ------------------------------------------------
    def load_catalog(self, versions: Optional[dict[str, str]] = None) -> Catalog:
        """Build the in-session Catalog view of this registry at the
        latest (or pinned) versions. Sources are lazy paths — nothing is
        read until a query touches it."""
        versions = versions or {}
        index = self._read_index()
        cat = Catalog(self.spark)
        for ds_id, entry in index["datasets"].items():
            v = versions.get(f"datasets/{ds_id}", entry["current"])
            d = self._data_dir("datasets", ds_id, v, index=index)
            config = DatasetConfig.model_validate_json(
                (d / "config.json").read_text()
            )
            lookup = d / "lookup.parquet"
            cat.register_dataset(
                ds_id, d / "table.parquet", config=config,
                lookup_source=lookup if lookup.exists() else None, version=v,
            )
        for name, entry in index["dimensions"].items():
            v = versions.get(f"dimensions/{name}", entry["current"])
            cat.register_dimension(
                name,
                self._data_dir("dimensions", name, v, index=index)
                / "records.parquet",
                version=v,
            )
        for name, entry in index["mappings"].items():
            v = versions.get(f"mappings/{name}", entry["current"])
            d = self._data_dir("mappings", name, v, index=index)
            cfg = json.loads((d / "config.json").read_text())
            cat.register_mapping(
                name, d / "records.parquet",
                from_dimension=cfg.get("from_dimension"),
                to_dimension=cfg.get("to_dimension"),
                mapping_type=cfg.get("mapping_type"), version=v,
            )
        return cat
