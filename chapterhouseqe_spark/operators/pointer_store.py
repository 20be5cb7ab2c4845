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
- :class:`HTTPPointerStore` + :class:`CASHTTPServer` — the remote
  shape: conditional PUT over HTTP with retry/backoff, and lost-ack
  resolution by re-read (the exactly-once commit ambiguity every
  networked CAS client must handle); the server model injects
  dropped responses and 5xx for the fault tests.

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


class CASHTTPServer:
    """Stdlib model of a remote conditional-write service (DynamoDB
    conditional PUT / etcd txn / GCS ``x-goog-if-generation-match``),
    so :class:`HTTPPointerStore` is proven against a genuinely REMOTE
    CAS — network round-trips, lost responses — not just the POSIX and
    in-process models.

    Protocol (one resource per pointer name):

    - ``GET /pointer/<name>`` → 200 with the value in the body, or 404.
    - ``PUT /pointer/<name>`` with ``If-Match: <value>`` (the literal
      ``\\x00absent`` means "expect no pointer") → 204 when the
      condition held and the write applied, 412 when it did not.

    Fault injection for tests: ``drop_acks_after_apply`` makes the
    next N conditional PUTs APPLY server-side but close the connection
    without a response — the lost-ack case a client must resolve by
    re-reading; ``fail_before_apply`` returns 503 WITHOUT applying —
    the retryable case.
    """

    ABSENT = "\x00absent"

    def __init__(self) -> None:
        import http.server

        self._values: dict[str, str] = {}
        self._mu = threading.Lock()
        self.drop_acks_after_apply = 0
        self.fail_before_apply = 0
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                name = self.path.rsplit("/", 1)[-1]
                with store._mu:
                    v = store._values.get(name)
                if v is None:
                    self.send_response(404)
                    self.end_headers()
                else:
                    body = v.encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

            def do_PUT(self):
                name = self.path.rsplit("/", 1)[-1]
                n = int(self.headers.get("Content-Length", 0))
                new = self.rfile.read(n).decode()
                expected = self.headers.get("If-Match", CASHTTPServer.ABSENT)
                with store._mu:
                    if store.fail_before_apply > 0:
                        store.fail_before_apply -= 1
                        self.send_response(503)
                        self.end_headers()
                        return
                    cur = store._values.get(name)
                    want = None if expected == CASHTTPServer.ABSENT else expected
                    ok = cur == want
                    if ok:
                        store._values[name] = new
                    if ok and store.drop_acks_after_apply > 0:
                        store.drop_acks_after_apply -= 1
                        # lost ack: write applied, response never sent
                        self.close_connection = True
                        self.connection.close()
                        return
                self.send_response(204 if ok else 412)
                self.end_headers()

        import http.server as hs

        self._httpd = hs.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        self.address = f"http://127.0.0.1:{self._httpd.server_address[1]}"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


class HTTPPointerStore:
    """CAS pointer store over HTTP conditional PUT.

    Same contract as the other stores: ``compare_and_swap`` succeeds
    for exactly one of any set of concurrent writers that read the
    same prior value — the SERVER serializes, this client only has to
    survive the network:

    - transient failures (connection refused, 5xx, timeout) are
      retried with backoff, bounded by ``max_attempts``;
    - a LOST RESPONSE after an applied write (the classic exactly-once
      commit ambiguity) is resolved by re-reading: if the pointer now
      equals ``new``, this writer's CAS applied and the ack was lost →
      success; if it still equals ``expected``, the write never
      applied → retry the PUT; anything else means another writer
      committed → failure. The resolution is value-equality (same ABA
      caveat as the file store — snapshot versions are monotonic
      integers, so values never repeat in this protocol).
    """

    def __init__(
        self,
        address: str,
        timeout_s: float = 5.0,
        max_attempts: int = 5,
        backoff_s: float = 0.05,
    ) -> None:
        self.address = address.rstrip("/")
        self.timeout_s = timeout_s
        self.max_attempts = max_attempts
        self.backoff_s = backoff_s

    def _url(self, name: str) -> str:
        return f"{self.address}/pointer/{name}"

    def read(self, name: str) -> str | None:
        import urllib.error
        import urllib.request

        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                req = urllib.request.Request(self._url(name))
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return r.read().decode()
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    return None
                last = e
            except OSError as e:  # refused / reset / timeout
                last = e
            time.sleep(self.backoff_s * (2**attempt))
        raise PointerStoreError(f"read({name}) failed: {last}")

    def compare_and_swap(
        self, name: str, expected: str | None, new: str
    ) -> bool:
        import urllib.error
        import urllib.request

        match = CASHTTPServer.ABSENT if expected is None else expected
        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                req = urllib.request.Request(
                    self._url(name),
                    data=new.encode(),
                    method="PUT",
                    headers={"If-Match": match},
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return r.status == 204
            except urllib.error.HTTPError as e:
                if e.code == 412:
                    return False
                last = e  # 5xx: not applied, retry
            except OSError as e:
                # Ambiguous: the server may have applied the write and
                # lost the ack. Re-read to resolve before retrying —
                # a blind retry would 412 against our OWN committed
                # value and report a false conflict.
                last = e
                try:
                    cur = self.read(name)
                except PointerStoreError:
                    time.sleep(self.backoff_s * (2**attempt))
                    continue
                if cur == new:
                    return True  # applied, ack lost
                if cur != expected:
                    return False  # another writer won
                # cur == expected: never applied — fall through, retry
            time.sleep(self.backoff_s * (2**attempt))
        raise PointerStoreError(f"compare_and_swap({name}) failed: {last}")
