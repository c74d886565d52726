"""Filesystem interface: local paths and Hadoop-FS URIs (object stores).

Mirrors the reference's filesystem abstraction (reference
dsgrid/filesystem/filesystem_interface.py, local_filesystem.py,
s3_filesystem.py:118, cloud/s3_storage_interface.py) re-expressed over
Spark's own Hadoop FileSystem layer instead of boto3: every scheme Spark
can read parquet from (file://, hdfs://, s3a://, gs://, abfss://) gets
metadata/text IO through the SAME JVM connector and credential chain the
parquet scans use — no second cloud SDK, no separate auth path.

Usage for an object-store deployment::

    spark.conf.set("spark.hadoop.fs.s3a.endpoint", "https://minio.internal:9000")
    spark.conf.set("spark.hadoop.fs.s3a.path.style.access", "true")
    fs = filesystem_for(spark, "s3a://bucket/registry")
    fs.write_text("s3a://bucket/registry/registry.json", index_json)

Object stores offer no atomic flock; multi-writer registry mutation over
s3a:// is serialized by the lock-file protocol in
``dsgrid_spark.registry.locking`` (uuid + TTL lock files built on
``create_exclusive`` below, matching the reference's S3 registry lock
files — cloud/s3_storage_interface.py:49-134 — with a stronger
create-exclusive + read-back handshake instead of check-then-write).
Reads and version-immutable data dirs are safe without locks because
version directories are never rewritten.
"""

from __future__ import annotations

import shutil
from abc import ABC, abstractmethod
from pathlib import Path
from urllib.parse import urlparse


class FilesystemInterface(ABC):
    """Reference filesystem_interface.py surface, trimmed to what the
    registry needs."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def mkdirs(self, path: str) -> None: ...

    @abstractmethod
    def listdir(self, path: str) -> list[str]: ...

    @abstractmethod
    def rm_tree(self, path: str) -> None: ...

    @abstractmethod
    def rename(self, src: str, dst: str) -> bool: ...

    @abstractmethod
    def read_text(self, path: str) -> str: ...

    @abstractmethod
    def write_text(self, path: str, text: str) -> None: ...

    @abstractmethod
    def list_sizes(self, path: str) -> list[tuple[str, int]]:
        """Recursive (file_path, bytes) listing of DATA files — names
        starting with '_' or '.' (markers, checksums, staging) are
        skipped, matching what Spark's readers ignore."""
        ...

    @abstractmethod
    def copy_tree(self, src: str, dst: str) -> None:
        """Recursive copy within this filesystem. Cross-scheme copies
        (local → s3a) are a bulk-transfer job (distcp / cloud CLI), not a
        metadata op — out of scope here."""
        ...

    @abstractmethod
    def create_exclusive(self, path: str, text: str) -> bool:
        """Create ``path`` with ``text`` ONLY if it does not exist;
        returns False (without writing) when it already does. Atomic on
        local/HDFS; best-effort on object stores whose create is
        last-writer-wins — callers needing a hard guarantee must verify
        by reading back (see registry/locking.py)."""
        ...


class LocalFilesystem(FilesystemInterface):
    """Plain-path implementation (reference local_filesystem.py)."""

    def _p(self, path: str) -> Path:
        parsed = urlparse(str(path))
        return Path(parsed.path if parsed.scheme == "file" else str(path))

    def exists(self, path: str) -> bool:
        return self._p(path).exists()

    def mkdirs(self, path: str) -> None:
        self._p(path).mkdir(parents=True, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return sorted(p.name for p in self._p(path).iterdir())

    def rm_tree(self, path: str) -> None:
        p = self._p(path)
        if p.is_dir():
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()

    def rename(self, src: str, dst: str) -> bool:
        self._p(src).replace(self._p(dst))
        return True

    def read_text(self, path: str) -> str:
        return self._p(path).read_text()

    def write_text(self, path: str, text: str) -> None:
        self._p(path).write_text(text)

    def list_sizes(self, path: str) -> list[tuple[str, int]]:
        out = []
        for p in sorted(self._p(path).rglob("*")):
            if p.is_file() and not p.name.startswith(("_", ".")):
                out.append((str(p), p.stat().st_size))
        return out

    def copy_tree(self, src: str, dst: str) -> None:
        s, d = self._p(src), self._p(dst)
        d.parent.mkdir(parents=True, exist_ok=True)
        if s.is_dir():
            shutil.copytree(s, d)
        else:
            shutil.copy2(s, d)

    def create_exclusive(self, path: str, text: str) -> bool:
        import os

        p = self._p(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        try:
            fd = os.open(str(p), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, text.encode("utf-8"))
        finally:
            os.close(fd)
        return True


class HadoopFilesystem(FilesystemInterface):
    """Any Hadoop-FS scheme via the session JVM (reference
    s3_filesystem.py, minus boto3: the s3a connector Spark already scans
    parquet through serves the metadata IO too, so credentials/endpoint
    configure ONCE via spark.hadoop.fs.s3a.*).
    """

    def __init__(self, spark, root_uri: str):
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI(str(root_uri)), conf
        )

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(str(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._path(path)))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def listdir(self, path: str) -> list[str]:
        statuses = self._fs.listStatus(self._path(path))
        return sorted(s.getPath().getName() for s in statuses)

    def rm_tree(self, path: str) -> None:
        self._fs.delete(self._path(path), True)

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._path(src), self._path(dst)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._path(path))
        try:
            return str(self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"))
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def list_sizes(self, path: str) -> list[tuple[str, int]]:
        it = self._fs.listFiles(self._path(path), True)
        out = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append((str(st.getPath().toString()), int(st.getLen())))
        return sorted(out)

    def copy_tree(self, src: str, dst: str) -> None:
        conf = self._fs.getConf()
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._path(src), self._fs, self._path(dst),
            False, conf,
        )

    def create_exclusive(self, path: str, text: str) -> bool:
        # FileSystem.create(path, overwrite=False) throws
        # FileAlreadyExistsException when the path exists — atomic on
        # HDFS; on S3A the existence check races (document at the caller).
        try:
            out = self._fs.create(self._path(path), False)
        except Exception as e:  # Py4JJavaError wrapping FileAlreadyExists
            if "AlreadyExists" in str(e) or "already exists" in str(e):
                return False
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True


def filesystem_for(spark, root: str) -> FilesystemInterface:
    """Pick the implementation from the root's scheme (reference
    filesystem factory): bare paths and file:// stay on fast local IO;
    any other scheme goes through the Hadoop connector."""
    scheme = urlparse(str(root)).scheme
    if scheme in ("", "file"):
        return LocalFilesystem()
    return HadoopFilesystem(spark, root)
