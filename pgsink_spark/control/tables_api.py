"""Tables API: status state machine + add/stop table actions.

Reference: ``GET /api/tables`` joins the catalog with import jobs and
derives per-table publication/import status (api/tables.go:29-103), with
the status precedence implemented at api/tables.go:76-97:

    expired > complete > error > scheduled (no cursor) > in_progress

``AddTable``/``StopTable`` wrap publication get/set in a lock session
and expire open import jobs first (api/subscriptions.go:51-153).
"""

from __future__ import annotations

from dataclasses import dataclass

from pgsink_spark.control.publication import Publication
from pgsink_spark.imports.jobs import ImportJob, ImportJobStore


@dataclass(frozen=True)
class TableInfo:
    namespace: str
    name: str
    publication_status: str  # active | inactive
    import_status: str  # inactive | scheduled | in_progress | error | complete | expired
    import_rows_processed_total: int


def import_status(job: ImportJob | None) -> str:
    """Latest-job status, reference precedence (api/tables.go:76-97)."""
    if job is None:
        return "inactive"
    if job.expired_at is not None:
        return "expired"
    if job.completed_at is not None:
        return "complete"
    if job.error is not None:
        return "error"
    if job.cursor is None:
        return "scheduled"
    return "in_progress"


class TablesAPI:
    """Driver facade over publication + job store state."""

    def __init__(self, publication: Publication, jobs: ImportJobStore,
                 subscription_id: str = "default"):
        self.publication = publication
        self.jobs = jobs
        self.subscription_id = subscription_id

    def list_tables(self, catalog: list[tuple[str, str]]) -> list[TableInfo]:
        published = set(self.publication.get_tables())
        # latest job per table (max created_at — api/tables.go:65-74)
        latest: dict[tuple[str, str], ImportJob] = {}
        for j in self.jobs.all():
            key = (j.schema, j.table_name)
            if key not in latest or latest[key].created_at < j.created_at:
                latest[key] = j
        out = []
        for ns, name in sorted(catalog):
            job = latest.get((ns, name))
            status = import_status(job)
            rows = 0
            if job is not None and status not in ("expired", "unknown"):
                rows = job.rows_processed_total
            out.append(
                TableInfo(
                    namespace=ns,
                    name=name,
                    publication_status=(
                        "active" if (ns, name) in published else "inactive"
                    ),
                    import_status=status,
                    import_rows_processed_total=rows,
                )
            )
        return out

    def add_table(self, namespace: str, name: str, import_now: bool = True) -> ImportJob | None:
        """Publish a table and (optionally) enqueue its backfill."""
        self.publication.add(namespace, name)
        if import_now:
            return self.jobs.enqueue(self.subscription_id, namespace, name)
        return None

    def stop_table(self, namespace: str, name: str) -> int:
        """Unpublish + expire open import jobs (api/subscriptions.go:128-153)."""
        expired = self.jobs.expire(namespace, name)
        self.publication.remove(namespace, name)
        return expired

    # -- subscription-level surface (api/design/api.go:131-199) ---------
    def subscription(self) -> dict:
        """The Subscription resource: id + published tables (the shape
        goa generates for Subscriptions.Get/AddTable/StopTable)."""
        return {
            "id": self.subscription_id,
            "published_tables": [
                {"schema": ns, "name": name}
                for ns, name in sorted(self.publication.get_tables())
            ],
        }

    def list_imports(self) -> list[dict]:
        """The Imports.List resource rows (api/design/api.go:201-216,
        Import type :218-270): every job, timestamps as ISO datetimes."""
        from datetime import datetime, timezone

        def iso(ts: float | None) -> str | None:
            if ts is None:
                return None
            return datetime.fromtimestamp(ts, tz=timezone.utc).isoformat()

        return [
            {
                "id": j.id,
                "subscription_id": j.subscription_id,
                "schema": j.schema,
                "table_name": j.table_name,
                "completed_at": iso(j.completed_at),
                "created_at": iso(j.created_at),
                "updated_at": iso(j.updated_at),
                "expired_at": iso(j.expired_at),
                "error": j.error,
                "error_count": j.error_count,
                "last_error_at": iso(j.last_error_at),
                "rows_processed_total": j.rows_processed_total,
            }
            for j in self.jobs.all()
        ]
