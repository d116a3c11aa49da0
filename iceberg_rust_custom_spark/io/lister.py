"""Scheme-routed enumeration and removal of table DATA files.

Post-write enumeration previously walked the local filesystem
(``os.walk``/``os.listdir``), so every append commit (footer-stats
collection), MoR delete write, and orphan cleanup broke the moment a
table location pointed at an object store (``s3a://…``) — the first thing
a real cluster deployment does (VERDICT r10 #1). All of those paths now
route through this module:

* a FileIO backend that implements ``list`` (``mem://``, a registered
  cloud backend) serves its own scheme;
* everything else goes through the JVM's Hadoop ``FileSystem`` — the SAME
  machinery Spark itself writes with, so any warehouse Spark can write
  (``file://``, ``hdfs://``, ``s3a://``, ``gs://``, ``abfs://``) lists,
  stats, and deletes identically;
* bare local paths with no live SparkSession fall back to ``os.walk``.

Returned paths are re-anchored to the CALLER'S root spelling (a
``file:///…`` root yields ``file:///…`` paths, a bare root yields bare
paths), so manifests record paths in the table-location's own form and
round-trip through Spark reads unchanged.

Reference parity: iceberg-rust routes data-file IO through the
``object_store`` crate end to end (iceberg-rust/src/arrow/write.rs:39-129
writes and lists through an ``ObjectStore`` handle).
"""

from __future__ import annotations

import os
import urllib.parse
from dataclasses import dataclass

from iceberg_rust_custom_spark.io.fileio import FileIO


@dataclass(frozen=True)
class ListedFile:
    path: str  # anchored to the caller's root spelling
    size: int  # bytes
    mtime_ms: int  # epoch millis; 0 when the backend has no mtime


def _scheme(path: str) -> str:
    if path.startswith("file:"):
        return "file"
    return urllib.parse.urlparse(path).scheme if "://" in path else ""


def _strip_file(path: str) -> str:
    """file:///x | file:/x | /x → /x (local filesystem path)."""
    if path.startswith("file:"):
        rest = path[len("file:") :]
        while rest.startswith("//"):
            rest = rest[1:]
        return urllib.parse.unquote(rest)
    return path


def canon_path(p: str) -> str:
    """Canonical COMPARISON key for a data/metadata file path: local paths
    (bare or ``file:`` URIs in any slash spelling) normalize to one
    absolute path; other schemes keep their URI form. Use whenever paths
    from two producers (manifests, ``input_file_name()``,
    ``_metadata.file_path``, the lister) must be matched."""
    if p.startswith("file:") or "://" not in p:
        return os.path.abspath(_strip_file(p))
    return p


def _jfs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _active_session(spark):
    if spark is not None:
        return spark
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            return s
        # getActiveSession is THREAD-LOCAL and invisible inside worker
        # thread pools (footer-stats collection, r11). The JVM gateway and
        # its Hadoop configuration are process-global, so the instantiated
        # session serves scheme routing identically from any thread.
        return SparkSession._instantiatedSession
    except Exception:
        return None


def _hadoop_list(spark, root: str) -> list[ListedFile]:
    fs, jpath = _jfs(spark, root)
    if not fs.exists(jpath):
        return []
    qroot = fs.makeQualified(jpath).toString().rstrip("/")
    anchor = root.rstrip("/")
    out: list[ListedFile] = []
    it = fs.listFiles(jpath, True)  # recursive; object stores page natively
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.startswith(qroot):
            rel = p[len(qroot) :].lstrip("/")
            anchored = f"{anchor}/{rel}" if rel else root
        else:  # symlink/mount surprise: keep the qualified form
            anchored = p
        out.append(ListedFile(anchored, int(st.getLen()), int(st.getModificationTime())))
    out.sort(key=lambda f: f.path)
    return out


def _local_list(root: str) -> list[ListedFile]:
    base = _strip_file(root)
    if not os.path.isdir(base):
        return []
    anchor = root.rstrip("/")
    out: list[ListedFile] = []
    for dirpath, _dirs, names in os.walk(base):
        for name in names:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, base).replace(os.sep, "/")
            stat = os.stat(full)
            out.append(
                ListedFile(f"{anchor}/{rel}", stat.st_size, int(stat.st_mtime * 1000))
            )
    out.sort(key=lambda f: f.path)
    return out


def _backend_with_list(scheme: str):
    if scheme in ("", "file"):
        return None  # local: Hadoop (uniform) or the os.walk fallback
    impl = FileIO._schemes.get(scheme)
    return impl if impl is not None and hasattr(impl, "list") else None


def list_files(root: str, spark=None) -> list[ListedFile]:
    """Every file under ``root`` (recursive), scheme-routed; [] when the
    root does not exist. Paths come back in the caller's root spelling."""
    scheme = _scheme(root)
    impl = _backend_with_list(scheme)
    if impl is not None:
        return sorted(
            (ListedFile(p, int(size), int(mtime_ms)) for p, size, mtime_ms in impl.list(root)),
            key=lambda f: f.path,
        )
    spark = _active_session(spark)
    if spark is not None:
        return _hadoop_list(spark, root)
    if scheme in ("", "file"):
        return _local_list(root)
    raise ValueError(
        f"cannot list {root!r}: no FileIO backend with 'list' for scheme "
        f"{scheme!r} and no active SparkSession for Hadoop routing"
    )


def remove_file(path: str, spark=None) -> None:
    """Best-effort single-file delete, routed like ``list_files``."""
    scheme = _scheme(path)
    if scheme not in ("", "file") and FileIO._schemes.get(scheme) is not None:
        try:
            FileIO.delete(path)
        except FileNotFoundError:
            pass
        return
    spark = _active_session(spark)
    if spark is not None:
        fs, jpath = _jfs(spark, path)
        fs.delete(jpath, False)
        return
    try:
        os.remove(_strip_file(path))
    except OSError:
        pass


def read_bytes(path: str, spark=None) -> bytes:
    """Whole-file read for schemes FileIO has no backend for — served by
    Hadoop (Java 17: ``InputStream.readAllBytes``)."""
    scheme = _scheme(path)
    if scheme in ("", "file"):
        with open(_strip_file(path), "rb") as f:
            return f.read()
    impl = FileIO._schemes.get(scheme)
    if impl is not None:
        return FileIO.read_bytes(path)
    spark = _active_session(spark)
    if spark is None:
        raise ValueError(f"cannot read {path!r}: no FileIO backend and no SparkSession")
    fs, jpath = _jfs(spark, path)
    stream = fs.open(jpath)
    try:
        return bytes(stream.readAllBytes())
    finally:
        stream.close()


def hadoop_range_reader(path: str, spark=None):
    """(reader, size, close) for one Hadoop-readable file: ``reader(off, n)``
    serves ranged reads over ONE open FSDataInputStream (seek + readNBytes,
    Java 17), so parquet footer access is a couple of small reads — never a
    full-object download. Pass ``spark`` from worker threads; the active
    session is thread-local and invisible there (review r11)."""
    spark = _active_session(spark)
    if spark is None:
        raise ValueError(f"cannot open {path!r}: no FileIO backend and no SparkSession")
    fs, jpath = _jfs(spark, path)
    size = int(fs.getFileStatus(jpath).getLen())
    stream = fs.open(jpath)

    def read(off: int, n: int) -> bytes:
        stream.seek(off)
        return bytes(stream.readNBytes(n))

    return read, size, stream.close


class HadoopFileIO:
    """FileIO backend serving any scheme the JVM's Hadoop configuration
    can resolve (``viewfs://``, ``hdfs://``, ``s3a://`` when the cloud
    jars are present) — the analogue of iceberg-java's HadoopFileIO.
    Register per scheme::

        FileIO.register("viewfs", HadoopFileIO())

    With this, a table LOCATION on any Hadoop scheme works END TO END:
    the metadata plane (metadata.json, manifests, Puffin blobs) reads and
    writes through the JVM FileSystem, and the data plane was already
    scheme-routed (Spark writes/reads the files; ``io.lister`` enumerates
    via its direct Hadoop route — this class deliberately implements no
    ``list`` method so enumeration stays there). Reads are ranged over
    one open stream per call, so parquet footer access costs O(footer),
    never a whole-object download; writes are create-with-overwrite,
    safe for the engine's immutable uuid-named objects. Driver-side
    only: the executor data path ships (path, offset) pairs and Spark
    itself does the IO, so this backend never needs to pickle."""

    def __init__(self, spark=None):
        self._spark = spark

    def _fs(self, path: str):
        spark = _active_session(self._spark)
        if spark is None:
            raise ValueError(
                f"HadoopFileIO needs an active SparkSession to reach {path!r}"
            )
        return _jfs(spark, path)

    def read_bytes(self, path: str) -> bytes:
        fs, jpath = self._fs(path)
        stream = fs.open(jpath)
        try:
            return bytes(stream.readAllBytes())
        finally:
            stream.close()

    def read_range(self, path: str, offset: int, size: int) -> bytes:
        fs, jpath = self._fs(path)
        stream = fs.open(jpath)
        try:
            stream.seek(offset)
            return bytes(stream.readNBytes(size))
        finally:
            stream.close()

    def range_reader(self, path: str):
        """(reader, size, close) over ONE kept-open FSDataInputStream —
        pyarrow issues several ranged reads per parquet footer, and an
        open-per-read would cost an open RPC each on a real NameNode
        (review r12). ``FileIO.pq_parquet_file`` prefers this over
        ``read_range`` when a backend offers it."""
        spark = _active_session(self._spark)
        return hadoop_range_reader(path, spark)

    def write_bytes(self, path: str, data: bytes) -> None:
        fs, jpath = self._fs(path)
        stream = fs.create(jpath, True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def exists(self, path: str) -> bool:
        fs, jpath = self._fs(path)
        return bool(fs.exists(jpath))

    def size(self, path: str) -> int:
        fs, jpath = self._fs(path)
        return int(fs.getFileStatus(jpath).getLen())

    def delete(self, path: str) -> None:
        fs, jpath = self._fs(path)
        if not fs.delete(jpath, False) and fs.exists(jpath):
            raise OSError(f"could not delete {path}")


def file_size(path: str, spark=None) -> int:
    scheme = _scheme(path)
    if scheme in ("", "file"):
        return os.path.getsize(_strip_file(path))
    impl = FileIO._schemes.get(scheme)
    if impl is not None:
        return FileIO.size(path)
    spark = _active_session(spark)
    if spark is None:
        raise ValueError(f"cannot stat {path!r}: no FileIO backend and no SparkSession")
    fs, jpath = _jfs(spark, path)
    return int(fs.getFileStatus(jpath).getLen())


def sweep_empty_dirs(root: str, spark=None) -> None:
    """Remove now-empty subdirectories under ``root`` (never root itself).
    Only meaningful where directories are real (local/HDFS); object-store
    schemes are a no-op — their 'directories' vanish with their last key."""
    scheme = _scheme(root)
    if scheme not in ("", "file", "hdfs"):
        return
    spark = _active_session(spark)
    if spark is not None:
        fs, jpath = _jfs(spark, root)
        if not fs.exists(jpath):
            return

        def _sweep(d) -> bool:  # returns: is (now) empty
            statuses = fs.listStatus(d)
            empty = True
            for st in statuses:
                if st.isDirectory():
                    if _sweep(st.getPath()):
                        fs.delete(st.getPath(), False)
                    else:
                        empty = False
                else:
                    empty = False
            return empty

        _sweep(jpath)
        return
    base = _strip_file(root)
    if not os.path.isdir(base):
        return
    for dirpath, dirs, names in os.walk(base, topdown=False):
        if dirpath != base and not dirs and not names:
            try:
                os.rmdir(dirpath)
            except OSError:
                pass
