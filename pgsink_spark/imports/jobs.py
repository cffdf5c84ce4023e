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
- acquiring is mutually exclusive (the reference uses
  ``FOR UPDATE SKIP LOCKED``; here a claim set over a driver-local
  store — the control plane is tiny and single-driver, while the data
  plane stays fully distributed).

Persistence is an atomically-replaced JSON file; swap for a Delta table
with optimistic transactions in a multi-driver deployment.
"""

from __future__ import annotations

import json
import os
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
    ):
        self.path = path
        self.retry_interval_s = retry_interval_s
        self.max_backoff_s = max_backoff_s
        self._jobs: dict[int, ImportJob] = {}
        self._claimed: set[int] = set()
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

    # -- queue ops (reference manager.go / worker.go) -------------------
    def enqueue(self, subscription_id: str, schema: str, table_name: str) -> ImportJob:
        job = ImportJob(self._next_id, subscription_id, schema, table_name)
        self._jobs[job.id] = job
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
        """Claim one job: never-errored first, then oldest."""
        now = time.time() if now is None else now
        candidates = [j for j in self._jobs.values() if self._claimable(j, now)]
        if not candidates:
            return None
        candidates.sort(key=lambda j: (j.error is not None, j.id))
        job = candidates[0]
        self._claimed.add(job.id)
        return job

    def release(self, job_id: int) -> None:
        self._claimed.discard(job_id)

    def update_progress(self, job_id: int, cursor: str | None, rows: int) -> None:
        j = self._jobs[job_id]
        j.cursor = cursor
        j.rows_processed_total += rows
        j.updated_at = time.time()
        self._save()

    def record_error(self, job_id: int, message: str) -> None:
        j = self._jobs[job_id]
        j.error = message
        j.error_count += 1
        j.last_error_at = time.time()
        j.updated_at = time.time()
        self._claimed.discard(job_id)
        self._save()

    def complete(self, job_id: int) -> None:
        j = self._jobs[job_id]
        j.completed_at = time.time()
        j.updated_at = time.time()
        self._claimed.discard(job_id)
        self._save()

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
