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

    def compare_and_swap(
        self, name: str, expected: str | None, new: str
    ) -> bool:
        lock = self._path(name) + ".lock"
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # stale-lock breaking: a crashed writer's lock outlives it
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                return False  # lock vanished mid-check: someone is active
            if age < self.lock_timeout_s:
                return False  # an active writer holds it — fail, re-read
            try:
                os.remove(lock)
            except OSError:
                pass
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
