"""Filesystem primitives for TableStore roots — local or Hadoop-FS.

The reference's only durable store was a network MySQL database
(igf_data/igfdb/dbconnect.py:8-91), so it never faced filesystem
semantics; this engine's lake substrate does.  Pre-round-9, the
store's data-dir swaps already ran through the Hadoop FileSystem
(sources/sinks.py:swap_directory) but every METADATA primitive — the
commit-log journal, the writer lock, version manifests, schema
overrides, partitioning sidecars, stream markers, staged-append
moves — was raw ``os``/``shutil``, restricting transactional roots to
a local(-mounted) filesystem.  This module funnels all of those
through one small interface with two implementations:

- :class:`LocalFsIO` — the exact os/shutil calls the store always
  used, for plain paths (zero behavior change, zero JVM overhead).
- :class:`HadoopFsIO` — the same operations through the JVM's
  ``org.apache.hadoop.fs.FileSystem`` / ``FileContext`` handles for
  any ``scheme://`` root (``hdfs://``, ``file://``, ``viewfs://``,
  …) — the handle ``TableStore.table_bytes`` already obtains.

Atomicity contract (what the commit protocol actually relies on):

- :meth:`create_exclusive` — exactly one winner among concurrent
  creators (``os.O_EXCL`` locally; ``FileSystem.create(path,
  overwrite=false)`` on Hadoop — atomic on HDFS's namenode; on
  ``file://`` Hadoop's local implementation is check-then-create,
  same best-effort as any non-O_EXCL local protocol).
- :meth:`replace` — atomic rename that clobbers an existing
  destination (``os.replace`` locally; ``FileContext.rename(src,
  dst, Rename.OVERWRITE)`` on Hadoop).  This is the commit point
  (pending -> committed) and every metadata-file update; the journal
  update in particular renames *over* the live lock file so the lock
  never momentarily vanishes.

HDFS / file:// / viewfs provide both.  Object stores (s3/s3a/gs/
wasb/abfs/…) provide NEITHER — rename is copy+delete and exclusive
create is last-PUT-wins — so :func:`open_fs` REFUSES them with a
pointer at this note rather than silently running a protocol whose
crash states would corrupt the table.  The object-store path is the
manifest-pointer (append-only) commit design; until that lands, an
object-store root is an explicit error, not a latent data hazard.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Iterator

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")

#: schemes whose rename is copy+delete (non-atomic) and whose
#: "exclusive" create is last-PUT-wins — the commit protocol's two
#: load-bearing primitives both break, so these roots are refused
OBJECT_STORE_SCHEMES = frozenset(
    {
        "s3",
        "s3a",
        "s3n",
        "gs",
        "wasb",
        "wasbs",
        "abfs",
        "abfss",
        "oss",
        "cosn",
        "swift",
    }
)


def scheme_of(path: str) -> str | None:
    """The URI scheme of ``path`` (lowercased), or None for a plain
    local path.  Windows drive letters don't exist in this engine's
    deployment surface, so any ``xyz://`` prefix is a scheme."""
    m = _SCHEME_RE.match(path)
    return m.group(1).lower() if m else None


def open_fs(spark, root: str):
    """The FsIO implementation for ``root``: :class:`LocalFsIO` for
    plain paths, :class:`HadoopFsIO` for ``scheme://`` roots with
    rename-atomic semantics, and a refusal (with the reason) for
    object-store schemes — see the module docstring."""
    sch = scheme_of(root)
    if sch is None:
        return LocalFsIO()
    if sch in OBJECT_STORE_SCHEMES:
        raise ValueError(
            f"TableStore root {root!r} is on an object store "
            f"({sch}://): its rename is copy+delete and its create "
            "is last-PUT-wins, so the store's commit/lock protocol "
            "cannot run safely there.  Use an HDFS-semantics "
            "filesystem (hdfs://, viewfs://, a mounted file:// "
            "root), or wait for the manifest-pointer append-only "
            "commit mode (fsio.py module docstring)."
        )
    return HadoopFsIO(spark, root)


class LocalFsIO:
    """os/shutil-backed primitives — byte-for-byte the pre-round-9
    store behavior for plain local roots."""

    is_local = True

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def getmtime(self, p: str) -> float:
        return os.path.getmtime(p)

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def listdir(self, p: str) -> list[str]:
        return os.listdir(p)

    def walk(self, top: str) -> Iterator[tuple[str, list[str], list[str]]]:
        yield from os.walk(top)

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def write_text_atomic(
        self, p: str, text: str, tmp: str | None = None
    ) -> None:
        tmp = tmp or (p + ".tmp")
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, p)

    def create_exclusive(self, p: str) -> None:
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def unlink(self, p: str) -> None:
        os.unlink(p)

    def rmtree(self, p: str) -> None:
        shutil.rmtree(p, ignore_errors=True)


def _java_exception_classes(exc: Exception) -> list[str]:
    """Fully-qualified class names of the wrapped Java exception and
    its cause chain (empty when ``exc`` isn't a py4j Java error) —
    classification by CLASS is exact where the message wording is
    free-form and filesystem-dependent."""
    names: list[str] = []
    je = getattr(exc, "java_exception", None)
    seen = 0
    while je is not None and seen < 8:  # bounded: causes can cycle
        try:
            names.append(je.getClass().getName())
            je = je.getCause()
        except Exception:  # noqa: BLE001 — dead gateway mid-walk
            break
        seen += 1
    return names


def _is_missing(exc: Exception) -> bool:
    for cls in _java_exception_classes(exc):
        if cls.endswith("FileNotFoundException"):
            return True
    s = str(exc)
    return "FileNotFoundException" in s or "does not exist" in s


def _is_exists(exc: Exception) -> bool:
    # a FileAlreadyExists raised by a connector with different wording
    # must still classify as FileExistsError — create_exclusive's
    # callers CONTEND on it (lock wait/retry) rather than crash
    for cls in _java_exception_classes(exc):
        if cls.endswith("FileAlreadyExistsException"):
            return True
    s = str(exc)
    return "FileAlreadyExistsException" in s or "already exists" in s


class HadoopFsIO:
    """Hadoop-FileSystem-backed primitives for ``scheme://`` roots.

    Same interface and (OSError-family) error contract as
    :class:`LocalFsIO`: missing paths raise ``FileNotFoundError``,
    losing an exclusive create raises ``FileExistsError``, other JVM
    IO failures surface as ``OSError`` — so every existing
    ``contextlib.suppress(OSError)`` / ``except OSError`` site in the
    store behaves identically on both backends.

    Per-op cost is one py4j round-trip (~0.1-1 ms) — irrelevant for
    the store's metadata files (a few KB of JSON per commit), while
    the data-plane reads/writes stay pure Spark either way.
    """

    is_local = False

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        jp = self._jvm.org.apache.hadoop.fs.Path(root)
        self._fs = jp.getFileSystem(self._conf)
        self._fctx = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jp.toUri(), self._conf
        )
        ren = self._jvm.org.apache.hadoop.fs.Options.Rename
        self._overwrite = self._gw.new_array(ren, 1)
        self._overwrite[0] = ren.OVERWRITE

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._p(p)))

    def isdir(self, p: str) -> bool:
        try:
            return bool(self._fs.getFileStatus(self._p(p)).isDirectory())
        except Exception:  # noqa: BLE001 — missing = not a dir
            return False

    def getmtime(self, p: str) -> float:
        try:
            st = self._fs.getFileStatus(self._p(p))
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(p) if _is_missing(e) else OSError(
                f"getmtime {p}: {e}"
            ) from e
        return st.getModificationTime() / 1000.0

    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._p(p))

    def listdir(self, p: str) -> list[str]:
        try:
            statuses = self._fs.listStatus(self._p(p))
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(p) if _is_missing(e) else OSError(
                f"listdir {p}: {e}"
            ) from e
        return [s.getPath().getName() for s in statuses]

    def walk(self, top: str) -> Iterator[tuple[str, list[str], list[str]]]:
        """os.walk-shaped (topdown) recursion via listStatus; a
        missing/unreadable top yields nothing, like os.walk."""
        try:
            statuses = self._fs.listStatus(self._p(top))
        except Exception:  # noqa: BLE001
            return
        dirs, files = [], []
        for s in statuses:
            (dirs if s.isDirectory() else files).append(
                s.getPath().getName()
            )
        dirs.sort()
        files.sort()
        yield top, dirs, files
        for d in dirs:
            yield from self.walk(os.path.join(top, d))

    def read_text(self, p: str) -> str:
        try:
            stream = self._fs.open(self._p(p))
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(p) if _is_missing(e) else OSError(
                f"open {p}: {e}"
            ) from e
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(
        self, p: str, text: str, tmp: str | None = None
    ) -> None:
        tmp = tmp or (p + ".tmp")
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        self.replace(tmp, p)

    def create_exclusive(self, p: str) -> None:
        # Hadoop's create() silently mkdir-p's missing parents where
        # os.open raises — align to the os contract (the backends
        # must be behaviorally interchangeable; pinned by the
        # random-op equivalence property test).  The check-then-
        # create window is harmless: callers pre-create the lock dir
        parent = os.path.dirname(p)
        if parent and not self._fs.exists(self._p(parent)):
            raise FileNotFoundError(parent)
        try:
            out = self._fs.create(self._p(p), False)
        except Exception as e:  # noqa: BLE001
            raise FileExistsError(p) if _is_exists(e) else OSError(
                f"create {p}: {e}"
            ) from e
        out.close()

    def replace(self, src: str, dst: str) -> None:
        """Atomic rename-with-clobber (FileContext OVERWRITE) — the
        semantics ``os.replace`` gives locally; the journal/lock
        update depends on the destination never being momentarily
        absent."""
        try:
            self._fctx.rename(self._p(src), self._p(dst), self._overwrite)
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(src) if _is_missing(e) else OSError(
                f"rename {src} -> {dst}: {e}"
            ) from e

    def unlink(self, p: str) -> None:
        try:
            ok = self._fs.delete(self._p(p), False)
        except Exception as e:  # noqa: BLE001
            raise OSError(f"unlink {p}: {e}") from e
        if not ok:
            raise FileNotFoundError(p)

    def rmtree(self, p: str) -> None:
        try:
            self._fs.delete(self._p(p), True)
        except Exception:  # noqa: BLE001 — ignore_errors=True parity
            pass
