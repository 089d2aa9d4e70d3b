"""Small-file filesystem I/O for store metadata and commit artifacts.

The floored posting store (`index.write_floored_index` — the engine's
replacement for the reference's Vertica-served ``main_tokenized`` table,
``handlers.py:15``) keeps its layout parameters, landed-table log, and
commit markers as small JSON files next to the data. Those files need
three properties parquet writes don't give:

- **atomic replace** (`write_atomic`): readers see the old or the new
  complete file, never a torn write — temp sibling + rename;
- **atomic create-if-absent** (`create_exclusive`): the
  optimistic-concurrency primitive behind the store's commit markers —
  of two concurrent appenders claiming the same commit slot, exactly
  one wins;
- **Connect safety**: every function works without the py4j gateway
  (``spark._jvm`` is unavailable under Spark Connect).

Routing: LOCAL paths (no scheme, or ``file:``) always use the
pure-Python implementation — ``os.rename`` is an atomic overwrite and
``O_CREAT|O_EXCL`` is a true atomic claim on POSIX, whereas Hadoop's
``RawLocalFileSystem`` implements ``create(overwrite=false)`` as
check-then-act. Non-local paths go through the Hadoop ``FileSystem``
API via the gateway (HDFS ``create`` is namenode-atomic; ``rename``
onto an existing file needs a delete first — that non-atomic window is
documented at the one call site that can hit it). A non-local path on
a Connect session raises: the commit protocol cannot run without a
filesystem that honours these primitives.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

__all__ = [
    "create_exclusive",
    "delete",
    "exists",
    "listdir",
    "mkdirs",
    "read_bytes",
    "rename",
    "write_atomic",
]


import re as _re

_SCHEME = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _local(path: str) -> str | None:
    """The bare local path if ``path`` is local, else None.

    Local = the ``file:`` scheme or no scheme at all. Classification is
    by a real URI-scheme match, not substring probes — a relative
    directory that happens to start with ``s3`` (``s3_results/store``)
    is LOCAL, and routing it to the Hadoop branch would silently trade
    the O_EXCL CAS for RawLocalFileSystem's check-then-act create."""
    if path.startswith("file:"):
        p = path[len("file:"):]
        if p.startswith("//"):
            # file://authority/path — strip the authority (empty or
            # localhost for local files: file:///x, file://localhost/x)
            rest = p[2:]
            host, _slash, tail = rest.partition("/")
            if host not in ("", "localhost"):
                return None  # a genuinely remote file URI
            p = "/" + tail
        return p
    if _SCHEME.match(path):
        return None  # any non-file scheme → Hadoop FS via the gateway
    return path


def _gateway(spark: SparkSession):
    """(jvm, hadoop_conf) via py4j, or None under Spark Connect."""
    try:
        jvm = spark._jvm
        if jvm is None:
            return None
        return jvm, spark._jsc.hadoopConfiguration()
    except Exception:
        return None


def _jfs(spark: SparkSession, path: str):
    gw = _gateway(spark)
    if gw is None:
        raise RuntimeError(
            f"fsio: non-local path {path!r} needs the Hadoop FileSystem "
            "API, which is unavailable on this session (Spark Connect). "
            "Point the store at a local/file: path, or run the commit "
            "protocol from a classic session."
        )
    jvm, hconf = gw
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


def exists(spark: SparkSession, path: str) -> bool:
    lp = _local(path)
    if lp is not None:
        return os.path.exists(lp)
    fs, p, _ = _jfs(spark, path)
    return bool(fs.exists(p))


def read_bytes(spark: SparkSession, path: str) -> bytes | None:
    """File contents, or None if the path does not exist."""
    lp = _local(path)
    if lp is not None:
        try:
            with open(lp, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None
    fs, p, jvm = _jfs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def write_atomic(spark: SparkSession, path: str, data: bytes) -> None:
    """Replace ``path`` with ``data`` atomically: temp sibling + rename.

    Local: ``os.rename`` (atomic overwrite, POSIX). Hadoop: rename onto
    an existing destination fails on HDFS, so the old file is deleted
    first — a crash in that window loses the OLD version but never
    exposes a torn one (the temp write completed before the delete);
    callers that need old-or-new semantics on HDFS too should version
    their filenames (the commit-marker protocol does).
    """
    lp = _local(path)
    if lp is not None:
        os.makedirs(os.path.dirname(lp) or ".", exist_ok=True)
        tmp = f"{lp}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, lp)
        return
    fs, p, jvm = _jfs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp.{uuid.uuid4().hex}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if not fs.rename(tmp, p):  # dest exists (HDFS semantics): replace
        fs.delete(p, False)
        if not fs.rename(tmp, p):
            raise IOError(f"fsio.write_atomic: rename to {path} failed")


def create_exclusive(spark: SparkSession, path: str, data: bytes) -> bool:
    """Atomically create ``path`` iff absent; False if it already
    exists (somebody else holds the slot). The CAS primitive of the
    floored store's commit protocol."""
    lp = _local(path)
    if lp is not None:
        os.makedirs(os.path.dirname(lp) or ".", exist_ok=True)
        try:
            fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return True
    fs, p, jvm = _jfs(spark, path)
    try:
        out = fs.create(p, False)  # atomic on HDFS (namenode-serialized)
    except Exception as exc:  # py4j wraps FileAlreadyExistsException
        if "AlreadyExists" in str(exc) or "already exists" in str(exc):
            return False
        raise
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    return True


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; missing path is a no-op."""
    lp = _local(path)
    if lp is not None:
        if os.path.isdir(lp) and not os.path.islink(lp):
            shutil.rmtree(lp, ignore_errors=True)
        else:
            try:
                os.remove(lp)
            except FileNotFoundError:
                pass
        return
    fs, p, _ = _jfs(spark, path)
    fs.delete(p, True)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Move ``src`` to ``dst`` (used for directory swaps where the
    destination was just deleted). Returns False if the FS refused."""
    lp_s, lp_d = _local(src), _local(dst)
    if lp_s is not None and lp_d is not None:
        os.makedirs(os.path.dirname(lp_d) or ".", exist_ok=True)
        try:
            os.rename(lp_s, lp_d)
            return True
        except OSError:
            return False
    fs, p_s, jvm = _jfs(spark, src)
    p_d = jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(p_s, p_d))


def listdir(spark: SparkSession, path: str) -> list[str]:
    """Child names of a directory; [] if it does not exist."""
    lp = _local(path)
    if lp is not None:
        try:
            return sorted(os.listdir(lp))
        except FileNotFoundError:
            return []
    fs, p, _ = _jfs(spark, path)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    lp = _local(path)
    if lp is not None:
        os.makedirs(lp, exist_ok=True)
        return
    fs, p, _ = _jfs(spark, path)
    fs.mkdirs(p)
