"""Compare-and-swap pointer stores — the commit primitive snapshots
need on storage without atomic rename.

``write_snapshot`` (operators/maintenance.py) commits by atomically
swapping a one-line ``_LATEST`` pointer. POSIX ``os.replace`` gives
local filesystems that atomicity for free; object stores do NOT (an S3
PUT can interleave with another writer's, and last-write-wins loses a
committed version silently — the exact problem Delta's S3 LogStore
solves with DynamoDB conditional writes). This module isolates the
primitive behind one interface so the snapshot protocol is portable:

- :class:`LocalFSPointerStore` — correct on any POSIX filesystem:
  mutual exclusion via an ``O_EXCL`` lockfile (atomic create), then
  verify-expected + ``os.replace`` inside the critical section.
- :class:`InMemoryPointerStore` — a process-local stand-in with the
  semantics an external CAS service (DynamoDB conditional PUT, etcd
  txn, GCS ``x-goog-if-generation-match``) provides; used by tests to
  pin the protocol independent of any filesystem.

The contract: ``compare_and_swap`` succeeds for EXACTLY ONE of any set
of concurrent writers that read the same prior value — the loser must
re-read and rebuild, never blind-overwrite.
"""

from __future__ import annotations

import os
import threading
import time


class PointerStoreError(RuntimeError):
    pass


class InMemoryPointerStore:
    """CAS semantics of an external coordination service."""

    def __init__(self) -> None:
        self._values: dict[str, str] = {}
        self._lock = threading.Lock()

    def read(self, name: str) -> str | None:
        with self._lock:
            return self._values.get(name)

    def compare_and_swap(
        self, name: str, expected: str | None, new: str
    ) -> bool:
        with self._lock:
            if self._values.get(name) != expected:
                return False
            self._values[name] = new
            return True


class LocalFSPointerStore:
    """POSIX implementation: O_EXCL lockfile + verify + atomic replace.

    The lockfile bounds the critical section (stale locks older than
    ``lock_timeout_s`` are broken — a crashed writer must not wedge the
    table forever); within it the current value is re-read and compared
    to ``expected`` so a writer that lost a race fails the CAS instead
    of clobbering the winner's commit.
    """

    def __init__(self, root: str, lock_timeout_s: float = 60.0) -> None:
        self.root = root
        self.lock_timeout_s = lock_timeout_s
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> str | None:
        try:
            with open(self._path(name)) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def _break_stale(self, lock: str, judged: os.stat_result) -> bool:
        """Remove ``lock`` iff it is still the exact (inode, mtime)
        the caller judged stale. A bare ``os.remove`` races: between
        the caller's stat and the remove, another writer may have
        already broken the stale lock and O_EXCL-created a FRESH one
        at the same path — removing that would let two writers into
        the critical section. Two defenses: (1) breaking is serialized
        by a short-lived ``.breaker`` lock, so no two breakers
        interleave with a fresh acquirer; (2) before removing, the
        lock is re-stat'ed and its (st_ino, st_mtime_ns) compared to
        the judged-stale stat — a fresh lock is a different inode, so
        it is never removed. Returns True when the caller may retry
        acquisition (the stale lock is gone), False when a live writer
        is active and the CAS should fail so the caller re-reads.
        """
        blk = lock + ".breaker"
        try:
            bfd = os.open(blk, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # Another breaker is active — or crashed. The breaker
            # critical section is stat+remove (microseconds), so an
            # old breaker lock is a crash; clear it with the same
            # inode-compare discipline and let the caller retry later.
            try:
                bst = os.stat(blk)
            except OSError:
                return False
            if time.time() - bst.st_mtime < self.lock_timeout_s:
                return False
            try:
                cur = os.stat(blk)
                if (cur.st_ino, cur.st_mtime_ns) == (
                    bst.st_ino,
                    bst.st_mtime_ns,
                ):
                    os.remove(blk)
            except OSError:
                pass
            return False
        try:
            os.close(bfd)
            try:
                cur = os.stat(lock)
            except OSError:
                return True  # stale lock already gone — retry
            if (cur.st_ino, cur.st_mtime_ns) != (
                judged.st_ino,
                judged.st_mtime_ns,
            ):
                return False  # replaced by a live writer's fresh lock
            try:
                os.remove(lock)
            except OSError:
                pass
            return True
        finally:
            try:
                os.remove(blk)
            except OSError:
                pass

    def compare_and_swap(
        self, name: str, expected: str | None, new: str
    ) -> bool:
        lock = self._path(name) + ".lock"
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # stale-lock breaking: a crashed writer's lock outlives it
            try:
                st = os.stat(lock)
            except OSError:
                return False  # lock vanished mid-check: someone is active
            if time.time() - st.st_mtime < self.lock_timeout_s:
                return False  # an active writer holds it — fail, re-read
            if not self._break_stale(lock, st):
                return False
            return self.compare_and_swap(name, expected, new)
        try:
            os.close(fd)
            if self.read(name) != expected:
                return False
            tmp = self._path(name) + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(new)
            os.replace(tmp, self._path(name))
            return True
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass
