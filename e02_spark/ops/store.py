"""Pluggable storage backends for the snapshot table's COMMIT/METADATA
plane (ops/snapshot.py).

Why this exists at 100 TB: the lakehouse commit protocol was built on
two POSIX primitives — atomic create-if-absent via link(2) for the
version commit, and hard links for write-audit-publish adoption. A
100 TB table lives on an object store (S3/GCS/ABFS), which has NEITHER:
no rename, no links, no O_EXCL. What it does have is exactly this
interface:

    get_json            GET object
    put_json            PUT object            (atomic whole-object write)
    put_json_if_absent  conditional PUT       (S3 `If-None-Match: *`,
                                               GCS `ifGenerationMatch=0`)
    list_glob           LIST by prefix (+ client-side suffix filter)
    delete              DELETE                (idempotent)
    mtime               HEAD Last-Modified
    size / exists       HEAD Content-Length / existence
    get_bytes / put_bytes / put_bytes_if_absent
                        raw-object twins of the JSON ops for metadata
                        that is not JSON-object-shaped (Delta's NDJSON
                        commit logs, its `_last_checkpoint` pointer) —
                        same atomic whole-object / conditional-PUT
                        contract
    adopt_file          server-side COPY (or a hard link where the
                        backing store supports one — a pure optimization)

ops/snapshot.py routes every metadata/commit operation through
`store_for(table)`, so the protocol's correctness argument reduces to
this contract instead of POSIX semantics. The DATA plane (Spark parquet
writes, pyarrow footer reads) is NOT abstracted here: Spark and Arrow
already carry their own filesystem layer (s3a://, pyarrow.fs) — the
store only owns the operations where commit ATOMICITY is load-bearing.

Two implementations ship:

  * LocalFSStore (the default) — today's behavior: tmp + fsync +
    link(2) conditional create, hard-link adoption with an EXDEV
    byte-copy fallback.
  * FakeObjectStore — restricts itself to the S3-EXPRESSIBLE subset:
    adoption always copies bytes (object stores have no links), deletes
    are idempotent, and the conditional put models `If-None-Match: *`.
    It is backed by the local filesystem (Spark still reads the same
    paths), and the *emulation* of the service's internal atomicity
    uses a tmp file + link/replace — that is the stand-in for the
    store's server-side atomic PUT, not a primitive the code under
    test relies on. The existing fuzz + concurrency suites run against
    both stores (tests/test_snapshot_fuzz.py, test_layout.py), which is
    the evidence the protocol never leans on a POSIX-only behavior.

Note on list consistency: S3/GCS/ABFS have been strongly read-after-
write consistent for LIST since 2020/always, so no list-lag injection
is modeled; the commit protocol additionally never NEEDS list-after-put
of its own commit (the committer learns success from the conditional
put's return, and readers resolving `latest` a commit late simply read
the previous snapshot — normal snapshot isolation).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import threading
import uuid


class LocalFSStore:
    """POSIX-backed metadata store (the default). Conditional create via
    link(2) — the manifest appears fully written or not at all, and a
    version collision fails loudly; adoption via hard links (zero-copy)
    with a cross-filesystem byte-copy fallback."""

    def get_json(self, path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def _write_tmp(self, path: str, obj: dict) -> str:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f"tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(obj, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        return tmp

    def put_json(self, path: str, obj: dict) -> None:
        """Atomic whole-object write: a reader never sees a partial
        object under `path` (tmp + rename)."""
        os.replace(self._write_tmp(path, obj), path)

    def put_json_if_absent(self, path: str, obj: dict) -> bool:
        """Atomic create-if-absent: False when `path` already exists
        (the commit-race loser's signal)."""
        tmp = self._write_tmp(path, obj)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    # Raw-bytes twins of the JSON primitives, for metadata objects that
    # are not JSON-object-shaped (Delta's NDJSON commit logs, its
    # `_last_checkpoint` pointer). Same atomicity contract: a reader
    # never observes a partial object, and the conditional put is the
    # commit-race arbiter (`If-None-Match: *` on a real object store).

    def _write_tmp_bytes(self, path: str, data: bytes) -> str:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f"tmp-{uuid.uuid4().hex}.bin")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return tmp

    def get_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def put_bytes(self, path: str, data: bytes) -> None:
        os.replace(self._write_tmp_bytes(path, data), path)

    def put_bytes_if_absent(self, path: str, data: bytes) -> bool:
        tmp = self._write_tmp_bytes(path, data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def size(self, path: str) -> int:
        """Object size in bytes (HEAD Content-Length)."""
        return os.path.getsize(path)

    def exists(self, path: str) -> bool:
        """Object existence (HEAD, 404 -> False)."""
        return os.path.exists(path)

    def list_glob(self, pattern: str) -> list[str]:
        return _glob.glob(pattern)

    def delete(self, path: str) -> None:
        """Idempotent delete (missing object is not an error — the
        object-store DELETE contract, and what concurrent expirers
        need)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def mtime(self, path: str) -> float | None:
        """Last-modified time, or None when the object vanished (the
        caller then treats it as not-expirable this pass)."""
        try:
            return os.path.getmtime(path)
        except OSError:
            return None

    def adopt_file(self, src: str, dst: str) -> None:
        """Publish-time adoption of an immutable data file: hard link
        (no bytes move, and the source table expiring its copy cannot
        pull the inode out from under the adopter) with a byte-copy
        fallback for cross-filesystem staging (EXDEV). An
        already-present dst is SUCCESS, not an error: adopted files are
        immutable and adoption sites race (two exporters publishing the
        same snapshot, a replayed import) — the loser's outcome is the
        same bytes. Round 13: previously the loser fell from
        FileExistsError into the copy fallback and crashed on
        shutil's SameFileError (dst already hard-linked to src)."""
        try:
            os.link(src, dst)
        except FileExistsError:
            return  # concurrent/replayed adoption of the immutable file
        except OSError:
            tmp = dst + f".tmp-{uuid.uuid4().hex}"
            shutil.copyfile(src, tmp)
            # atomic publish: a concurrent reader sees the old complete
            # object or the new complete object, never a torn copy
            os.replace(tmp, dst)

    def cleanup_empty_dirs(self, root: str, cutoff: float) -> None:
        """FS hygiene after expire: drop commit dirs holding no parquet
        anymore (only _SUCCESS/.crc crumbs remain once their data files
        were collected), age-fenced so an in-flight write's dir — whose
        files still sit under _temporary/ — survives. Object stores have
        no directories; a real remote impl overrides this to a no-op."""
        for d in self.list_glob(os.path.join(root, "*")):
            if (
                os.path.isdir(d)
                and not _glob.glob(os.path.join(d, "*.parquet"))
                and (self.mtime(d) or float("inf")) <= cutoff
            ):
                shutil.rmtree(d, ignore_errors=True)


class FakeObjectStore(LocalFSStore):
    """S3-semantics stand-in for tests: everything LocalFSStore does,
    minus the POSIX-only affordances —

      * `adopt_file` ALWAYS copies bytes (object stores have no links;
        this is the server-side COPY a real impl would issue);
      * `put_json_if_absent` models the conditional PUT
        (`If-None-Match: *`): the same atomic outcome, with the tmp+link
        underneath standing in for the SERVICE's internal atomicity, not
        exposed to callers.

    `counts` tallies the primitives used, so a test can assert the code
    under test stayed within the object-store-expressible subset. The
    tally is lock-guarded: the concurrency suites (e.g. concurrent merge
    writers) drive one store instance from many threads, and a bare
    `dict[k] += 1` can drop increments under contention."""

    def __init__(self) -> None:
        self._counts_lock = threading.Lock()
        self.counts = {
            "get": 0, "put": 0, "conditional_put": 0, "list": 0,
            "delete": 0, "copy": 0,
        }

    def _tally(self, key: str) -> None:
        with self._counts_lock:
            self.counts[key] += 1

    def get_json(self, path: str) -> dict:
        self._tally("get")
        return super().get_json(path)

    def put_json(self, path: str, obj: dict) -> None:
        self._tally("put")
        super().put_json(path, obj)

    def put_json_if_absent(self, path: str, obj: dict) -> bool:
        self._tally("conditional_put")
        return super().put_json_if_absent(path, obj)

    def get_bytes(self, path: str) -> bytes:
        self._tally("get")
        return super().get_bytes(path)

    def put_bytes(self, path: str, data: bytes) -> None:
        self._tally("put")
        super().put_bytes(path, data)

    def put_bytes_if_absent(self, path: str, data: bytes) -> bool:
        self._tally("conditional_put")
        return super().put_bytes_if_absent(path, data)

    def list_glob(self, pattern: str) -> list[str]:
        self._tally("list")
        return super().list_glob(pattern)

    def delete(self, path: str) -> None:
        self._tally("delete")
        super().delete(path)

    def adopt_file(self, src: str, dst: str) -> None:
        self._tally("copy")
        # server-side COPY: never a link; tmp+replace stands in for the
        # service's atomic whole-object semantics (a racing second COPY
        # overwrites with identical bytes — the S3 outcome)
        tmp = dst + f".tmp-{uuid.uuid4().hex}"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)


_DEFAULT_STORE = LocalFSStore()
_REGISTRY: dict[str, LocalFSStore] = {}


def _norm(path: str) -> str:
    """Registry key normalization: URI-style paths ('s3://bucket/…')
    pass through VERBATIM — os.path.abspath would mangle the scheme's
    double slash and anchor them to the CWD; plain filesystem paths
    normalize to absolute so registration and lookup agree. Relative
    paths still resolve against the CWD at CALL time — register and
    look up with absolute paths in anything long-lived (every table
    path in this repo is absolute)."""
    return path if "://" in path else os.path.abspath(path)


def register_store(prefix: str, store) -> None:
    """Route every table whose path starts with `prefix` through
    `store`. Longest registered prefix wins; unregistered paths use the
    LocalFSStore default. A production deployment would register its
    object-store impl for 's3://bucket/'-style prefixes here (URI
    prefixes are matched verbatim — see _norm)."""
    _REGISTRY[_norm(prefix)] = store


def unregister_store(prefix: str) -> None:
    _REGISTRY.pop(_norm(prefix), None)


def store_for(table: str):
    if _REGISTRY:
        p = _norm(table)
        best = None
        for prefix in _REGISTRY:
            if (
                p == prefix
                or p.startswith(prefix + os.sep)
                # URI prefixes match on a path-segment boundary only:
                # 's3://bucket' must NOT capture 's3://bucket-other/tbl'.
                or ("://" in prefix and p.startswith(prefix.rstrip("/") + "/"))
            ) and (best is None or len(prefix) > len(best)):
                best = prefix
        if best is not None:
            return _REGISTRY[best]
    return _DEFAULT_STORE
