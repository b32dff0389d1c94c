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
wasb/abfs/…) provide NEITHER — rename is copy+delete and a plain
create is last-PUT-wins — so their backends advertise
``rename_atomic = False`` and the store switches to its
MANIFEST-POINTER commit mode (append-only: immutable data segments,
per-table pointer files, the commit marker PUT as the commit point —
see store.py "object-store commit mode").  That mode leans on the
primitives object stores DO provide, each public and documented:

- atomic whole-object PUT (:meth:`put_text`): readers see the old or
  the new object in full, never a torn write — S3/GCS/Azure all
  guarantee this, so single-file metadata updates need no tmp+rename.
- conditional PUT (:meth:`put_if_absent`): exactly one winner among
  concurrent creators of the same key — S3 ``If-None-Match: *``
  (since 2024, the primitive Delta/Iceberg commit protocols use),
  GCS ``ifGenerationMatch=0``, Azure ``If-None-Match: *``.  This
  replaces O_EXCL for the writer lock.
- strongly consistent LIST (S3 since 2020; GCS/Azure always).

:class:`ObjectStoreFsIO` is the local SIMULATION of those semantics
(the test surface): ``replace``/``create_exclusive`` RAISE — proving
no code path in manifest-commit mode depends on them — while
``put_text``/``put_if_absent`` emulate the stores' native atomic PUT
locally.  :class:`HadoopObjectFsIO` is the same discipline over a
real ``s3a://``-class connector.
"""

from __future__ import annotations

import contextlib
import os
import re
import shutil
from typing import Iterator

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")

#: schemes whose rename is copy+delete (non-atomic) and whose plain
#: create is last-PUT-wins — the rename protocol's two load-bearing
#: primitives both break, so these roots get the object backend
#: (rename_atomic=False) and the store's manifest-pointer commit mode
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


class UnsupportedFsOperation(OSError):
    """The backend's filesystem cannot provide this primitive (e.g.
    atomic rename on an object store) — reaching it is a PROTOCOL bug:
    manifest-commit mode must never call it."""


def open_fs(spark, root: str):
    """The FsIO implementation for ``root``: :class:`LocalFsIO` for
    plain paths, :class:`HadoopFsIO` for ``scheme://`` roots with
    rename-atomic semantics, and :class:`HadoopObjectFsIO`
    (``rename_atomic = False`` — the store switches to manifest-
    pointer commits) for object-store schemes — see the module
    docstring."""
    sch = scheme_of(root)
    if sch is None:
        return LocalFsIO()
    if sch in OBJECT_STORE_SCHEMES:
        return HadoopObjectFsIO(spark, root)
    return HadoopFsIO(spark, root)


class LocalFsIO:
    """os/shutil-backed primitives — byte-for-byte the pre-round-9
    store behavior for plain local roots."""

    is_local = True
    #: atomic rename-with-clobber + O_EXCL create available: the store
    #: runs its rename-based commit protocol.  False switches it to
    #: manifest-pointer commits (see module docstring).
    rename_atomic = True
    #: is :meth:`put_if_absent` a TRUE conditional PUT (exactly one
    #: winner, content lands with the creation)?  False means the
    #: backend can only check-then-create — a residual race window the
    #: store's lock machinery must bound (ownership re-verification on
    #: every journal write + the mtime lease; see _acquire_lock).  The
    #: active regime is recorded in every journal spec so operators can
    #: see which guarantee their deployment actually runs under.
    conditional_put_atomic = True

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def getmtime(self, p: str) -> float:
        return os.path.getmtime(p)

    def getsize(self, p: str) -> int:
        return os.path.getsize(p)

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

    def put_text(self, p: str, text: str) -> None:
        """Atomic full-content overwrite — the local analog of an
        object store's whole-object PUT."""
        self.write_text_atomic(p, text)

    def put_if_absent(self, p: str, text: str) -> None:
        """Atomic create-with-content, exactly one winner among
        concurrent callers (the conditional-PUT primitive).  Locally:
        write a private temp, then ``os.link`` it to the destination —
        link is atomic AND exclusive, so the winner's file appears
        with its full content in one step (no empty-lock window)."""
        import uuid  # noqa: PLC0415

        tmp = f"{p}.cput-{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        try:
            os.link(tmp, p)
        except FileExistsError:
            raise FileExistsError(p) from None
        finally:
            with contextlib.suppress(OSError):
                os.unlink(tmp)

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
    rename_atomic = True

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._root = root
        # JVM handles are LAZY: resolving a FileSystem for a scheme
        # loads its connector class, which may not ship in every
        # environment (e.g. hadoop-aws for s3a) — backend SELECTION
        # must not require the connector, only actual I/O does
        self.__fs = None
        self.__fctx = None
        self.__overwrite = None

    @property
    def _fs(self):
        if self.__fs is None:
            jp = self._jvm.org.apache.hadoop.fs.Path(self._root)
            self.__fs = jp.getFileSystem(self._conf)
        return self.__fs

    @property
    def _fctx(self):
        if self.__fctx is None:
            jp = self._jvm.org.apache.hadoop.fs.Path(self._root)
            self.__fctx = (
                self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                    jp.toUri(), self._conf
                )
            )
        return self.__fctx

    @property
    def _overwrite(self):
        if self.__overwrite is None:
            ren = self._jvm.org.apache.hadoop.fs.Options.Rename
            arr = self._gw.new_array(ren, 1)
            arr[0] = ren.OVERWRITE
            self.__overwrite = arr
        return self.__overwrite

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

    def getsize(self, p: str) -> int:
        try:
            return int(self._fs.getFileStatus(self._p(p)).getLen())
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(p) if _is_missing(e) else OSError(
                f"getsize {p}: {e}"
            ) from e

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

    def put_text(self, p: str, text: str) -> None:
        """Whole-object overwrite through ``create(overwrite=true)``.
        On object-store connectors the content uploads as ONE PUT at
        ``close()`` — atomic by the store's contract; on HDFS-class
        filesystems this is a plain create (callers in rename-atomic
        mode use :meth:`write_text_atomic` instead)."""
        out = self._fs.create(self._p(p), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def put_if_absent(self, p: str, text: str) -> None:
        """Create-with-content, failing when the object exists.  On
        object-store connectors with conditional-create support (s3a
        ``fs.s3a.create.conditional.enabled``, HADOOP-19256; the GCS
        and ABFS connectors' generation/etag preconditions) the
        exclusivity commits WITH the content PUT at ``close()`` —
        atomic end to end.  Without it, ``create(overwrite=false)``
        is check-then-create; the store's lease machinery (mtime
        lease + grace window for content-less locks) bounds the
        residual race exactly as it does for HDFS-local semantics."""
        try:
            out = self._fs.create(self._p(p), False)
        except Exception as e:  # noqa: BLE001
            raise FileExistsError(p) if _is_exists(e) else OSError(
                f"create {p}: {e}"
            ) from e
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()


class ObjectStoreFsIO(LocalFsIO):
    """Local-directory SIMULATION of object-store filesystem
    semantics — the test surface for the store's manifest-pointer
    commit mode (``TableStore(..., object_store=True)``).

    What it takes away (the two primitives object stores lack):
    ``replace`` (atomic rename) and ``create_exclusive`` (O_EXCL)
    RAISE :class:`UnsupportedFsOperation` — so any code path still
    depending on them fails loudly in tests instead of shipping a
    protocol whose crash states corrupt tables on S3/GCS/Azure.

    What it keeps: ``put_text`` / ``put_if_absent`` emulate the
    stores' NATIVE atomic whole-object PUT and conditional PUT
    (module docstring lists the public store-side guarantees); the
    local tmp+rename / link inside those emulations is implementation
    detail of the emulation, not a protocol dependency.
    ``write_text_atomic`` routes to ``put_text`` because single-object
    overwrite IS atomic on object stores — no tmp+rename exists."""

    rename_atomic = False

    def replace(self, src: str, dst: str) -> None:
        raise UnsupportedFsOperation(
            f"atomic rename {src!r} -> {dst!r}: object stores rename "
            "by copy+delete; the manifest-commit protocol must never "
            "rely on rename atomicity"
        )

    def create_exclusive(self, p: str) -> None:
        raise UnsupportedFsOperation(
            f"exclusive create {p!r}: a plain object-store PUT is "
            "last-writer-wins; use put_if_absent (conditional PUT)"
        )

    def write_text_atomic(
        self, p: str, text: str, tmp: str | None = None
    ) -> None:
        # single-object PUT is natively atomic — tmp+rename is neither
        # available nor needed (the emulation below uses a local
        # os.replace internally, which is the SIMULATION of the PUT's
        # atomicity, not a protocol dependency)
        self.put_text(p, text)

    def put_text(self, p: str, text: str) -> None:
        import uuid  # noqa: PLC0415

        tmp = f"{p}.put-{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, p)


class CheckThenCreateFsIO(ObjectStoreFsIO):
    """Weak-regime simulation: an object store (or connector
    configuration) WITHOUT conditional PUT.  ``put_if_absent`` is
    check-then-create — exists() then put_text() — the exact
    primitive ``FileSystem.create(path, overwrite=false)`` reduces to
    on a connector lacking HADOOP-19256-class conditional create.
    Two writers landing inside the check→PUT window can BOTH succeed
    (the second clobbers the first); the store bounds that residual
    race with ownership re-verification on every journal write plus
    the mtime lease (see store._verify_lock_owned).  ``race_hook``
    (a callable) runs between the check and the PUT so tests can
    force the interleaving deterministically."""

    conditional_put_atomic = False

    def __init__(self):
        self.race_hook = None

    def put_if_absent(self, p: str, text: str) -> None:
        if os.path.exists(p):
            raise FileExistsError(p)
        if self.race_hook is not None:
            self.race_hook()
        self.put_text(p, text)


class HadoopObjectFsIO(HadoopFsIO):
    """Object-store connector backend (``s3a://``, ``gs://``,
    ``abfs://``, …): the :class:`ObjectStoreFsIO` discipline over a
    real Hadoop connector.  ``rename_atomic = False`` switches the
    store to manifest-pointer commits; the rename/O_EXCL primitives
    raise rather than run the connector's non-atomic emulations."""

    rename_atomic = False
    #: capability names HADOOP-19256-era connectors answer for
    #: conditional create (s3a; the GCS/ABFS connectors' generation/
    #: etag preconditions surface under the same PathCapabilities
    #: mechanism) — probed lazily, result cached
    _COND_CREATE_CAPS = (
        "fs.capability.conditional.create",
        "fs.capability.create.conditional",
    )

    @property
    def conditional_put_atomic(self) -> bool:
        """Probe (once) whether this connector's
        ``create(overwrite=false)`` commits exclusivity WITH the
        content PUT (true conditional create) or is check-then-create.
        Order: PathCapabilities on the root; then the s3a enable flag
        (``fs.s3a.create.conditional.enabled``); unknown probes report
        False — the store then runs the weaker lock regime (ownership
        re-verification + lease), which is correct on both, just
        noisier, and records the regime in every journal spec."""
        cached = getattr(self, "_cond_put", None)
        if cached is not None:
            return cached
        result = False
        try:
            jp = self._jvm.org.apache.hadoop.fs.Path(self._root)
            for cap in self._COND_CREATE_CAPS:
                try:
                    if bool(self._fs.hasPathCapability(jp, cap)):
                        result = True
                        break
                except Exception:  # noqa: BLE001 — older Hadoop: no method/cap
                    continue
            if not result and scheme_of(self._root) in ("s3", "s3a", "s3n"):
                result = (
                    str(
                        self._conf.get(
                            "fs.s3a.create.conditional.enabled", "false"
                        )
                    ).lower()
                    == "true"
                )
        except Exception:  # noqa: BLE001 — dead gateway / no connector
            result = False
        self._cond_put = result
        return result

    def replace(self, src: str, dst: str) -> None:
        raise UnsupportedFsOperation(
            f"atomic rename {src!r} -> {dst!r}: this root's rename is "
            "copy+delete; manifest-commit mode must never call it"
        )

    def create_exclusive(self, p: str) -> None:
        raise UnsupportedFsOperation(
            f"exclusive create {p!r}: plain create is last-PUT-wins "
            "here; use put_if_absent (conditional PUT)"
        )

    def write_text_atomic(
        self, p: str, text: str, tmp: str | None = None
    ) -> None:
        self.put_text(p, text)
