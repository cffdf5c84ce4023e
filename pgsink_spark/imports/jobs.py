"""Import-job queue: persisted backfill work items.

Schema and semantics follow the reference's ``pgsink.import_jobs`` table
(structure.sql:36-50) and its worker claim loop:

- claim predicate: not completed, not expired, and either never errored
  or past the exponential-backoff deadline
  ``LEAST(max_backoff, retry_interval * 3^error_count)``
  (pkg/imports/worker.go:139-200, backoff at :147-161);
- never-errored jobs are claimed first (``ORDER BY error IS NULL DESC``);
- progress updates bump ``cursor`` and ``rows_processed_total``
  (pkg/imports/importer.go:143-160);
- acquiring is mutually exclusive ACROSS DRIVERS (the reference uses
  ``FOR UPDATE SKIP LOCKED``, pkg/imports/worker.go:165-187; here a
  pluggable per-job lease backend — ``FileLeaseBackend`` for drivers
  sharing a POSIX filesystem, ``ObjectStoreLeaseBackend`` for cloud
  deployments where atomic O_EXCL create does not exist but
  conditional PUT/DELETE (S3 ``If-None-Match``/``If-Match``, GCS
  generation preconditions) does), and every mutator merges its dirty
  jobs over the on-disk state UNDER AN EXCLUSIVE ADVISORY LOCK so two
  drivers progressing different jobs never clobber each other's
  updates (without the lock the load-merge-write is a lost-update
  race; with it the per-job overlay is serialized and conflict-free).

Persistence is an atomically-replaced JSON file; swap for a Delta table
with optimistic transactions when the queue outgrows one filesystem.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import socket as _socket
import tempfile
import time
from dataclasses import asdict, dataclass, field


@contextlib.contextmanager
def _flocked(lock_path: str):
    """Exclusive advisory lock held for the block — the serialization
    primitive for every read-check-modify sequence on shared files
    (advisory is fine: all mutators in this module take it)."""
    os.makedirs(os.path.dirname(lock_path) or ".", exist_ok=True)
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


class FileLeaseBackend:
    """Per-job lease files for drivers sharing a POSIX filesystem.

    O_EXCL creation is the fast-path row lock; the steal (expired
    lease) and release paths are read-check-modify sequences, so they
    serialize under one advisory flock — without it, a lease crossing
    its TTL between a holder's read and remove can be stolen mid-
    release and the original owner then deletes the thief's lease,
    admitting a third concurrent claimant (ADVICE r4).
    """

    def __init__(self, root: str):
        self.root = root

    def _lease_path(self, job_id: int) -> str:
        return os.path.join(self.root, f"{job_id}.lease")

    def acquire(self, job_id: int, owner: str, now: float, ttl_s: float) -> bool:
        os.makedirs(self.root, exist_ok=True)
        lease = self._lease_path(job_id)
        payload = json.dumps({"owner": owner, "at": now}).encode()
        try:
            fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            pass
        else:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            return True
        # held: steal only if expired, serialized against other
        # stealers AND against the holder's release
        with _flocked(os.path.join(self.root, ".lock")):
            try:
                with open(lease) as f:
                    held = json.load(f)
            except FileNotFoundError:
                held = None
            except (OSError, ValueError):
                held = {}
            if held is None:
                # released while we waited for the lock — take it
                # fresh via O_EXCL: a concurrent fast-path creator
                # does NOT hold the flock, so only the atomic create
                # can arbitrate here
                try:
                    fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    return False
                with os.fdopen(fd, "wb") as f:
                    f.write(payload)
                return True
            if now - held.get("at", now) <= ttl_s:
                return False  # live lease, someone else's claim
            # expired: overwrite in place — fast-path creators are
            # blocked by the file's existence, other stealers and the
            # holder's release serialize on the flock we hold
            tmp = f"{lease}.new.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, lease)
            return True

    def release(self, job_id: int, owner: str) -> None:
        lease = self._lease_path(job_id)
        with _flocked(os.path.join(self.root, ".lock")):
            try:
                with open(lease) as f:
                    held = json.load(f)
            except (OSError, ValueError):
                return
            if held.get("owner") == owner:
                os.remove(lease)


class LocalConditionalStore:
    """Local-directory emulator of an object store's conditional API
    (S3 ``If-None-Match: *`` PUT / ``If-Match`` DELETE, GCS
    ``ifGenerationMatch``). In production the SERVICE serializes these
    primitives; the emulator stands in with an flock so the lease
    logic above it exercises exactly the object-store contract —
    put-if-absent, get-with-etag, replace-if-match, delete-if-match —
    and nothing filesystem-specific."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key)

    @contextlib.contextmanager
    def _tx(self):
        os.makedirs(self.root, exist_ok=True)
        with _flocked(os.path.join(self.root, ".lock")):
            yield

    @staticmethod
    def _new_etag() -> str:
        return os.urandom(8).hex()

    def put_if_absent(self, key: str, data: bytes) -> str | None:
        with self._tx():
            if os.path.exists(self._path(key)):
                return None
            etag = self._new_etag()
            with open(self._path(key), "wb") as f:
                f.write(etag.encode() + b"\n" + data)
            return etag

    def get(self, key: str) -> tuple[bytes, str] | None:
        with self._tx():
            try:
                with open(self._path(key), "rb") as f:
                    raw = f.read()
            except FileNotFoundError:
                return None
            etag, _, data = raw.partition(b"\n")
            return data, etag.decode()

    def replace_if_match(self, key: str, data: bytes, etag: str) -> str | None:
        with self._tx():
            try:
                with open(self._path(key), "rb") as f:
                    cur = f.read().partition(b"\n")[0].decode()
            except FileNotFoundError:
                return None
            if cur != etag:
                return None
            new = self._new_etag()
            with open(self._path(key), "wb") as f:
                f.write(new.encode() + b"\n" + data)
            return new

    def delete_if_match(self, key: str, etag: str) -> bool:
        with self._tx():
            try:
                with open(self._path(key), "rb") as f:
                    cur = f.read().partition(b"\n")[0].decode()
            except FileNotFoundError:
                return False
            if cur != etag:
                return False
            os.remove(self._path(key))
            return True


class ObjectStoreLeaseBackend:
    """Leases over conditional-PUT primitives — the cloud-safe claim
    path where O_EXCL/rename atomicity does not exist.

    Every transition is generation-guarded, so it is race-free WITHOUT
    any lock on the client side: acquire is put-if-absent; steal is
    replace-if-match against the etag the expired payload was read
    under (only one stealer's precondition holds); release is
    delete-if-match against the etag WE wrote (a lease stolen and
    re-granted since has a different generation, so a late release
    fails harmlessly instead of deleting the thief's lease).
    """

    def __init__(self, store):
        self.store = store
        self._etags: dict[int, str] = {}

    @staticmethod
    def _key(job_id: int) -> str:
        return f"{job_id}.lease"

    def acquire(self, job_id: int, owner: str, now: float, ttl_s: float) -> bool:
        payload = json.dumps({"owner": owner, "at": now}).encode()
        etag = self.store.put_if_absent(self._key(job_id), payload)
        if etag is not None:
            self._etags[job_id] = etag
            return True
        got = self.store.get(self._key(job_id))
        if got is None:
            # released between our PUT and GET; one clean retry
            etag = self.store.put_if_absent(self._key(job_id), payload)
            if etag is not None:
                self._etags[job_id] = etag
                return True
            return False
        data, cur_etag = got
        try:
            held = json.loads(data)
        except ValueError:
            held = {}
        if now - held.get("at", now) <= ttl_s:
            return False
        new_etag = self.store.replace_if_match(
            self._key(job_id), payload, cur_etag
        )
        if new_etag is None:
            return False  # lost the steal race
        self._etags[job_id] = new_etag
        return True

    def release(self, job_id: int, owner: str) -> None:
        etag = self._etags.pop(job_id, None)
        if etag is not None:
            self.store.delete_if_match(self._key(job_id), etag)


@dataclass
class ImportJob:
    id: int
    subscription_id: str
    schema: str
    table_name: str
    cursor: str | None = None
    completed_at: float | None = None
    expired_at: float | None = None
    error: str | None = None
    error_count: int = 0
    last_error_at: float | None = None
    rows_processed_total: int = 0
    created_at: float = field(default_factory=time.time)
    updated_at: float = field(default_factory=time.time)


class ImportJobStore:
    """Driver-side job queue with reference claim/backoff semantics."""

    def __init__(
        self,
        path: str,
        retry_interval_s: float = 5.0,
        max_backoff_s: float = 3600.0,
        owner: str | None = None,
        lease_ttl_s: float = 300.0,
        lease_backend=None,
    ):
        self.path = path
        self.retry_interval_s = retry_interval_s
        self.max_backoff_s = max_backoff_s
        # claim identity: distinct per driver process (the pid in a
        # FOR UPDATE SKIP LOCKED world); tests inject fixed owners
        self.owner = owner or f"{_socket.gethostname()}:{os.getpid()}"
        self.lease_ttl_s = lease_ttl_s
        self._leases = lease_backend or FileLeaseBackend(f"{path}.leases")
        self._jobs: dict[int, ImportJob] = {}
        self._claimed: set[int] = set()
        self._dirty: set[int] = set()
        self._next_id = 1
        if os.path.exists(path):
            self._load()

    # -- persistence ----------------------------------------------------
    def _load(self) -> None:
        with open(self.path) as f:
            data = json.load(f)
        self._jobs = {j["id"]: ImportJob(**j) for j in data["jobs"]}
        self._next_id = data["next_id"]

    def _save(self) -> None:
        """Merge-write UNDER THE QUEUE LOCK: overlay this driver's dirty
        jobs on the on-disk state, so concurrent drivers committing
        different jobs never undo each other. The per-job lease makes
        each job single-writer, but the shared FILE is still a
        read-modify-write — without the flock, two drivers can both
        load, then write sequentially, and the first writer's update is
        silently clobbered by the second's stale snapshot (ADVICE r4
        lost-update)."""
        with _flocked(f"{self.path}.lock"):
            self._merge_write()

    def _merge_write(self) -> None:
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    disk = json.load(f)
                merged = {j["id"]: ImportJob(**j) for j in disk["jobs"]}
                self._next_id = max(self._next_id, disk["next_id"])
            except (OSError, ValueError):
                merged = {}
        else:
            merged = {}
        for jid in self._dirty:
            if jid in self._jobs:
                merged[jid] = self._jobs[jid]
        self._jobs = merged
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {
                    "next_id": self._next_id,
                    "jobs": [asdict(j) for j in self._jobs.values()],
                },
                f,
            )
        os.replace(tmp, self.path)
        self._dirty.clear()

    # -- cross-process lease (the FOR UPDATE SKIP LOCKED analogue) ------
    def _acquire_lease(self, job_id: int, now: float) -> bool:
        return self._leases.acquire(job_id, self.owner, now, self.lease_ttl_s)

    def _release_lease(self, job_id: int) -> None:
        self._leases.release(job_id, self.owner)

    # -- queue ops (reference manager.go / worker.go) -------------------
    def enqueue(self, subscription_id: str, schema: str, table_name: str) -> ImportJob:
        """Mint-and-write atomically under the queue lock: without it,
        two drivers can both read the same ``next_id`` and one enqueue
        silently vanishes under the other's write."""
        with _flocked(f"{self.path}.lock"):
            if os.path.exists(self.path):
                self._load()  # pick up other drivers' enqueues for next_id
            job = ImportJob(self._next_id, subscription_id, schema, table_name)
            self._jobs[job.id] = job
            self._dirty.add(job.id)
            self._next_id += 1
            self._merge_write()
        return job

    def backoff_s(self, error_count: int) -> float:
        """LEAST(max, interval * 3^errors) — reference worker.go:147-161."""
        return min(self.max_backoff_s, self.retry_interval_s * 3**error_count)

    def _claimable(self, j: ImportJob, now: float) -> bool:
        if j.completed_at is not None or j.expired_at is not None:
            return False
        if j.id in self._claimed:
            return False
        if j.error_count == 0:
            return True
        return now > (j.last_error_at or 0) + self.backoff_s(j.error_count)

    def claim(self, now: float | None = None) -> ImportJob | None:
        """Claim one job: never-errored first, then oldest. The claim
        is arbitrated ACROSS drivers by the per-job lease file, so two
        stores over one queue path can never hand out the same job —
        a claimant that loses the lease race simply moves to the next
        candidate (SKIP LOCKED semantics)."""
        now = time.time() if now is None else now
        if os.path.exists(self.path):
            self._load()  # see other drivers' completions/errors
        candidates = [j for j in self._jobs.values() if self._claimable(j, now)]
        candidates.sort(key=lambda j: (j.error is not None, j.id))
        for job in candidates:
            if self._acquire_lease(job.id, now):
                self._claimed.add(job.id)
                return job
        return None

    def release(self, job_id: int) -> None:
        self._claimed.discard(job_id)
        self._release_lease(job_id)

    def update_progress(self, job_id: int, cursor: str | None, rows: int) -> None:
        j = self._jobs[job_id]
        j.cursor = cursor
        j.rows_processed_total += rows
        j.updated_at = time.time()
        self._dirty.add(job_id)
        self._save()

    def record_error(self, job_id: int, message: str) -> None:
        j = self._jobs[job_id]
        j.error = message
        j.error_count += 1
        j.last_error_at = time.time()
        j.updated_at = time.time()
        self._claimed.discard(job_id)
        self._dirty.add(job_id)
        self._save()
        self._release_lease(job_id)

    def complete(self, job_id: int) -> None:
        j = self._jobs[job_id]
        j.completed_at = time.time()
        j.updated_at = time.time()
        self._claimed.discard(job_id)
        self._dirty.add(job_id)
        self._save()
        self._release_lease(job_id)

    def expire(self, schema: str, table_name: str) -> int:
        """Expire open jobs for a table (reference api/subscriptions.go:128-153)."""
        n = 0
        for j in self._jobs.values():
            if (
                j.schema == schema
                and j.table_name == table_name
                and j.completed_at is None
                and j.expired_at is None
            ):
                j.expired_at = time.time()
                j.updated_at = time.time()
                self._claimed.discard(j.id)
                self._dirty.add(j.id)
                self._release_lease(j.id)
                n += 1
        if n:
            self._save()
        return n

    def get(self, job_id: int) -> ImportJob:
        return self._jobs[job_id]

    def all(self) -> list[ImportJob]:
        """Full listing, refreshed from disk.

        The read path of the file-backed queue: another process (an
        import worker) may have progressed jobs since this store
        loaded, and the control API lists through this method — reload
        so status reflects the file, like a SELECT would.
        """
        if os.path.exists(self.path):
            self._load()
        return sorted(self._jobs.values(), key=lambda j: j.id)
