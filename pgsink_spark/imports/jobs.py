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
  ``FOR UPDATE SKIP LOCKED``, pkg/imports/worker.go:165-187; here an
  atomic-rename lease file per job under ``<path>.leases/`` — O_EXCL
  creation is the filesystem's row lock, stale leases past
  ``lease_ttl_s`` are stolen with a rename race that only one claimant
  can win, and every mutator merges its dirty jobs over the on-disk
  state so two drivers progressing different jobs never clobber each
  other's updates).

Persistence is an atomically-replaced JSON file; swap for a Delta table
with optimistic transactions when the queue outgrows one filesystem.
"""

from __future__ import annotations

import json
import os
import socket as _socket
import tempfile
import time
from dataclasses import asdict, dataclass, field


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
    ):
        self.path = path
        self.retry_interval_s = retry_interval_s
        self.max_backoff_s = max_backoff_s
        # claim identity: distinct per driver process (the pid in a
        # FOR UPDATE SKIP LOCKED world); tests inject fixed owners
        self.owner = owner or f"{_socket.gethostname()}:{os.getpid()}"
        self.lease_ttl_s = lease_ttl_s
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
        """Merge-write: overlay this driver's dirty jobs on the on-disk
        state, so concurrent drivers committing different jobs never
        undo each other (each driver only mutates jobs it holds leases
        on, so the per-job overlay is conflict-free)."""
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
    def _lease_path(self, job_id: int) -> str:
        return os.path.join(f"{self.path}.leases", f"{job_id}.lease")

    def _acquire_lease(self, job_id: int, now: float) -> bool:
        """Atomically take the per-job lease; steal it only when it is
        older than ``lease_ttl_s`` (crashed claimant). Exactly one
        claimant can win either path: O_EXCL creation for a fresh
        lease, a rename race for a stale one."""
        os.makedirs(f"{self.path}.leases", exist_ok=True)
        lease = self._lease_path(job_id)
        payload = json.dumps({"owner": self.owner, "at": now}).encode()

        def try_create() -> bool:
            try:
                fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            return True

        if try_create():
            return True
        try:
            with open(lease) as f:
                held = json.load(f)
        except (OSError, ValueError):
            held = {}
        if now - held.get("at", now) <= self.lease_ttl_s:
            return False  # live lease, someone else's claim
        # stale: only one stealer wins the rename
        steal = f"{lease}.steal.{os.getpid()}.{time.monotonic_ns()}"
        try:
            os.rename(lease, steal)
        except OSError:
            return False
        os.remove(steal)
        return try_create()

    def _release_lease(self, job_id: int) -> None:
        lease = self._lease_path(job_id)
        try:
            with open(lease) as f:
                held = json.load(f)
            if held.get("owner") == self.owner:
                os.remove(lease)
        except (OSError, ValueError):
            pass

    # -- queue ops (reference manager.go / worker.go) -------------------
    def enqueue(self, subscription_id: str, schema: str, table_name: str) -> ImportJob:
        if os.path.exists(self.path):
            self._load()  # pick up other drivers' enqueues for next_id
        job = ImportJob(self._next_id, subscription_id, schema, table_name)
        self._jobs[job.id] = job
        self._dirty.add(job.id)
        self._next_id += 1
        self._save()
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
