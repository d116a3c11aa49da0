"""FileIO: scheme-dispatched metadata storage.

The reference routes ALL metadata IO through the ``object_store`` crate, so
any backend (local FS, S3, GCS) is a config change
(iceberg-rust/src/table/manifest.rs uses the store handle; commits via
copy_if_not_exists, iceberg-file-catalog/src/lib.rs:306-361). This module
plays that role for the engine's metadata plane: every metadata.json,
manifest parquet, manifest-list and Avro file read/write goes through
``FileIO``, dispatched on the path's scheme.

Built-in schemes:

* (no scheme) / ``file://`` — local filesystem, atomic tmp+rename writes;
* ``mem://`` — in-process store (tests; also the S3-semantics double).

An S3/GCS backend is ``FileIO.register("s3", impl)`` away — the engine
code never touches ``open()`` for metadata directly. DATA files are read
and written by Spark itself, which already handles object-store URLs
(s3a://…) natively on a real cluster; this module deliberately covers only
the metadata plane the engine owns.
"""

from __future__ import annotations

import io
import os
import threading
from urllib.parse import urlparse


class _LocalScheme:
    def read_bytes(self, path: str) -> bytes:
        with open(self._strip(path), "rb") as f:
            return f.read()

    def read_range(self, path: str, offset: int, size: int) -> bytes:
        with open(self._strip(path), "rb") as f:
            f.seek(offset)
            return f.read(size)

    def write_bytes(self, path: str, data: bytes) -> None:
        p = self._strip(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._strip(path))

    def size(self, path: str) -> int:
        return os.path.getsize(self._strip(path))

    def delete(self, path: str) -> None:
        os.remove(self._strip(path))

    @staticmethod
    def _strip(path: str) -> str:
        """file:///x | file:/x | /x → /x (every slash spelling: our own
        URIs use ///, Hadoop's FileStatus strings use file:/)."""
        if not path.startswith("file:"):
            return path
        rest = path[len("file:") :]
        while rest.startswith("//"):
            rest = rest[1:]
        from urllib.parse import unquote

        return unquote(rest)

    _strip_any = _strip


class _MemScheme:
    """In-process byte store (mem://bucket/key…)."""

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def read_bytes(self, path: str) -> bytes:
        try:
            return self._objects[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    def write_bytes(self, path: str, data: bytes) -> None:
        with self._lock:
            self._objects[path] = bytes(data)

    def exists(self, path: str) -> bool:
        return path in self._objects

    def size(self, path: str) -> int:
        return len(self.read_bytes(path))

    def delete(self, path: str) -> None:
        with self._lock:
            try:
                del self._objects[path]
            except KeyError:
                raise FileNotFoundError(path) from None

    def list(self, root: str):
        """(path, size, mtime_ms) for every object under the root prefix —
        the lister contract (io/lister.py); mem has no mtimes (0)."""
        prefix = root.rstrip("/") + "/"
        with self._lock:
            return sorted(
                (p, len(b), 0)
                for p, b in self._objects.items()
                if p == root or p.startswith(prefix)
            )


class _RangeReadFile(io.RawIOBase):
    """Seekable read-only file over ranged GETs. pyarrow's parquet footer
    reads (ParquetFile.metadata / schema) touch only the tail, so stats
    collection on object stores pays O(footer), not O(file)."""

    def __init__(self, reader, size: int, close=None):
        self._reader = reader  # callable (offset, n) -> bytes
        self._size = int(size)
        self._pos = 0
        self._close = close

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            self._pos = self._size + offset
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = max(0, min(n, self._size - self._pos))
        if n == 0:
            return b""
        data = self._reader(self._pos, n)
        self._pos += len(data)
        return data

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def size(self) -> int:
        return self._size

    def close(self) -> None:
        if self._close is not None:
            try:
                self._close()
            finally:
                self._close = None
        super().close()


class FileIO:
    _schemes: dict[str, object] = {}
    # scheme → (module-level factory, kwargs): a PICKLABLE recipe for
    # rebuilding a backend in another process. Executor-side tasks ship
    # this spec and call ensure(), so remote blobs (DV ranged GETs) are
    # fetched where the data is processed instead of funneling through a
    # driver thread pool (ADVICE r6).
    _factories: dict[str, tuple] = {}

    @classmethod
    def register(cls, scheme: str, impl) -> None:
        cls._schemes[scheme] = impl

    @classmethod
    def register_factory(cls, scheme: str, factory, kwargs: dict | None = None) -> None:
        """Record how to rebuild ``scheme``'s backend from scratch in a
        fresh process: ``factory(**kwargs)``. Both must be picklable —
        a module-level function and plain-data kwargs."""
        cls._factories[scheme] = (factory, dict(kwargs or {}))

    @classmethod
    def executor_spec(cls) -> dict:
        """The picklable registration recipes (to close over in a UDF)."""
        return dict(cls._factories)

    @classmethod
    def ensure(cls, spec: dict) -> None:
        """Idempotently materialize backends from a spec (executor-side)."""
        for scheme, (factory, kwargs) in spec.items():
            if scheme not in cls._schemes:
                cls.register(scheme, factory(**kwargs))

    @classmethod
    def _impl(cls, path: str):
        scheme = urlparse(path).scheme if "://" in path else ""
        if scheme in ("", "file"):
            return cls._schemes[""]
        try:
            return cls._schemes[scheme]
        except KeyError:
            raise ValueError(
                f"no FileIO backend registered for scheme {scheme!r} ({path}); "
                f"FileIO.register({scheme!r}, impl) to add one"
            ) from None

    # ------------------------------------------------------------- byte API
    @classmethod
    def read_bytes(cls, path: str) -> bytes:
        return cls._impl(path).read_bytes(path)

    @classmethod
    def read_range(cls, path: str, offset: int, size: int) -> bytes:
        """Ranged read — one blob per GET on object stores (deletion-vector
        blobs address into a shared Puffin file via offset/size). Backends
        without a native ranged read fall back to read-all + slice."""
        impl = cls._impl(path)
        if hasattr(impl, "read_range"):
            return impl.read_range(path, offset, size)
        return impl.read_bytes(path)[offset : offset + size]

    @classmethod
    def write_bytes(cls, path: str, data: bytes) -> None:
        cls._impl(path).write_bytes(path, data)

    @classmethod
    def read_text(cls, path: str) -> str:
        return cls.read_bytes(path).decode("utf-8")

    @classmethod
    def write_text(cls, path: str, text: str) -> None:
        cls.write_bytes(path, text.encode("utf-8"))

    @classmethod
    def exists(cls, path: str) -> bool:
        return cls._impl(path).exists(path)

    @classmethod
    def size(cls, path: str) -> int:
        return cls._impl(path).size(path)

    @classmethod
    def delete(cls, path: str) -> None:
        cls._impl(path).delete(path)

    # --------------------------------------------------------- parquet API
    @classmethod
    def pq_parquet_file(cls, path: str, spark=None):
        """A ``pyarrow.parquet.ParquetFile`` for any scheme: local paths
        open directly (zero copy); remote schemes open through a SEEKABLE
        ranged reader, so footer/metadata access costs O(footer) GETs —
        never a full-object download (review r11; a 10 GB append was
        re-downloading every written byte to read a few-KB footer).
        Backends without ranged reads fall back to one full read; schemes
        with no registered backend route through the JVM's Hadoop
        FileSystem (pass ``spark`` from worker threads — the active
        session is thread-local)."""
        import pyarrow.parquet as pq

        scheme = urlparse(path).scheme if "://" in path else ""
        if scheme in ("", "file") or path.startswith("file:"):
            return pq.ParquetFile(_LocalScheme._strip_any(path))
        impl = cls._schemes.get(scheme)
        if impl is not None:
            if hasattr(impl, "range_reader"):
                # one kept-open stream for all of pyarrow's footer reads
                # (HadoopFileIO: open-per-read costs an RPC each, r12)
                reader, size, close = impl.range_reader(path)
                return pq.ParquetFile(_RangeReadFile(reader, size, close))
            if hasattr(impl, "read_range"):
                return pq.ParquetFile(
                    _RangeReadFile(
                        lambda off, n: impl.read_range(path, off, n), impl.size(path)
                    )
                )
            return pq.ParquetFile(io.BytesIO(impl.read_bytes(path)))
        from iceberg_rust_custom_spark.io.lister import hadoop_range_reader

        reader, size, close = hadoop_range_reader(path, spark)
        return pq.ParquetFile(_RangeReadFile(reader, size, close))

    @classmethod
    def pq_read_table(cls, path: str):
        import pyarrow.parquet as pq

        impl = cls._impl(path)
        if isinstance(impl, _LocalScheme):
            return pq.read_table(_LocalScheme._strip(path))
        return pq.read_table(io.BytesIO(impl.read_bytes(path)))

    @classmethod
    def pq_write_table(cls, table, path: str, **kwargs) -> None:
        import pyarrow.parquet as pq

        impl = cls._impl(path)
        if isinstance(impl, _LocalScheme):
            p = _LocalScheme._strip(path)
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            pq.write_table(table, p, **kwargs)
            return
        buf = io.BytesIO()
        pq.write_table(table, buf, **kwargs)
        impl.write_bytes(path, buf.getvalue())


FileIO.register("", _LocalScheme())
FileIO.register("mem", _MemScheme())


class _S3Scheme:
    """s3:// metadata backend over a boto3 S3 client — registered on demand
    with :func:`register_s3` (boto3 is an optional dependency; data files
    keep going through Spark's own s3a:// support)."""

    def __init__(self, client):
        self.client = client

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        u = urlparse(path)
        return u.netloc, u.path.lstrip("/")

    def read_bytes(self, path: str) -> bytes:
        bucket, key = self._split(path)
        try:
            return self.client.get_object(Bucket=bucket, Key=key)["Body"].read()
        except Exception as e:  # noqa: BLE001
            code = (getattr(e, "response", None) or {}).get("Error", {}).get("Code")
            if code in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from e
            raise

    def read_range(self, path: str, offset: int, size: int) -> bytes:
        bucket, key = self._split(path)
        try:
            return self.client.get_object(
                Bucket=bucket, Key=key, Range=f"bytes={offset}-{offset + size - 1}"
            )["Body"].read()
        except Exception as e:  # noqa: BLE001
            code = (getattr(e, "response", None) or {}).get("Error", {}).get("Code")
            if code in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from e
            raise

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self.client.put_object(Bucket=bucket, Key=key, Body=data)

    def exists(self, path: str) -> bool:
        bucket, key = self._split(path)
        try:
            self.client.head_object(Bucket=bucket, Key=key)
            return True
        except Exception as e:  # noqa: BLE001
            code = (getattr(e, "response", None) or {}).get("Error", {}).get("Code")
            if code in ("404", "NoSuchKey", "NotFound"):
                return False
            raise

    def size(self, path: str) -> int:
        bucket, key = self._split(path)
        return int(self.client.head_object(Bucket=bucket, Key=key)["ContentLength"])

    def delete(self, path: str) -> None:
        bucket, key = self._split(path)
        self.client.delete_object(Bucket=bucket, Key=key)


def _s3_from_kwargs(**boto3_client_kwargs):
    """Module-level factory (picklable by reference) used by executor-side
    self-registration."""
    import boto3  # noqa: PLC0415 - optional dependency by design

    return _S3Scheme(boto3.client("s3", **boto3_client_kwargs))


def register_s3(client=None, executor_kwargs: dict | None = None, **boto3_client_kwargs) -> None:
    """Route ``s3://`` metadata IO through a boto3 S3 client (built via the
    standard AWS chain when not passed). One call makes every metadata.json,
    manifest, manifest-list and Avro interop file live on S3.

    When built from kwargs (standard chain / endpoint_url / explicit
    creds), the same kwargs are recorded as an executor factory so Spark
    tasks rebuild the backend where they run (DV blob decode stays fully
    distributed). A pre-built ``client`` is process-local (not picklable);
    pass ``executor_kwargs`` to provide its reconstruction recipe."""
    if client is None:
        import boto3  # noqa: PLC0415 - optional dependency by design

        client = boto3.client("s3", **boto3_client_kwargs)
        FileIO.register_factory("s3", _s3_from_kwargs, boto3_client_kwargs)
    elif executor_kwargs is not None:
        FileIO.register_factory("s3", _s3_from_kwargs, executor_kwargs)
    FileIO.register("s3", _S3Scheme(client))
