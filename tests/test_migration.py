"""Control-schema migration runner (reference
internal/migration/migration.go:15-39 — boot-time goose.Up with a
schema_migrations version table), as file-store transforms."""

from __future__ import annotations

import json
import os

from pgsink_spark.control.migration import (
    JOBS_FILE,
    MIGRATIONS,
    VERSION_FILE,
    applied_versions,
    migrate,
)
from pgsink_spark.imports.jobs import ImportJob, ImportJobStore


def test_migrate_applies_once_and_records_versions(tmp_path):
    root = str(tmp_path / "ctl")
    first = migrate(root)
    assert first == sorted(m.version for m in MIGRATIONS)

    recs = applied_versions(root)
    assert [r["version"] for r in recs] == first
    assert all(r["applied_at"] > 0 for r in recs)
    # names match the reference migration files, in apply order
    assert recs[0]["name"] == "create_import_jobs_table"
    assert recs[-1]["name"] == "alter_table_import_jobs_add_progress"

    # second boot: single application — nothing new applied, version
    # table unchanged
    assert migrate(root) == []
    assert applied_versions(root) == recs

    # the create migration made a claimable-empty queue
    store = ImportJobStore(os.path.join(root, JOBS_FILE))
    assert store.all() == []
    assert store.claim() is None


def test_migrate_backfills_old_format_records(tmp_path):
    """A root written by an OLD build (records predating the
    error/progress/schema columns, plus a column the current schema
    dropped) migrates into the canonical ImportJob shape."""
    root = str(tmp_path / "ctl")
    os.makedirs(root)
    old = {
        "next_id": 3,
        "jobs": [
            {
                "id": 1,
                "subscription_id": "sub-a",
                "table_name": "orders",
                "legacy_publication_oid": 1234,  # dropped column
            },
            {
                "id": 2,
                "subscription_id": "sub-a",
                "schema": "sales",
                "table_name": "lineitem",
                "error": "boom",
            },
        ],
    }
    with open(os.path.join(root, JOBS_FILE), "w") as f:
        json.dump(old, f)

    migrate(root)

    with open(os.path.join(root, JOBS_FILE)) as f:
        data = json.load(f)
    by_id = {j["id"]: j for j in data["jobs"]}
    # add_schema_column backfilled the reference default; existing
    # values survived
    assert by_id[1]["schema"] == "public"
    assert by_id[2]["schema"] == "sales"
    # progress / error-count backfills
    assert by_id[1]["rows_processed_total"] == 0
    assert by_id[1]["error_count"] == 0
    assert by_id[2]["error"] == "boom"
    # the drop+recreate normalization removed the dead column
    assert "legacy_publication_oid" not in by_id[1]
    # and the store loads the migrated records as full dataclasses
    store = ImportJobStore(os.path.join(root, JOBS_FILE))
    jobs = {j.id: j for j in store.all()}
    assert isinstance(jobs[1], ImportJob)
    assert jobs[1].table_name == "orders"
    assert jobs[2].error == "boom"


def test_migrate_resumes_after_partial_application(tmp_path):
    """Crash-mid-chain: a version table holding a prefix of the chain
    resumes at the first unapplied version (goose semantics)."""
    root = str(tmp_path / "ctl")
    migrate(root)
    # rewind the version table to the first 4 entries
    recs = applied_versions(root)
    with open(os.path.join(root, VERSION_FILE), "w") as f:
        json.dump(recs[:4], f)

    applied = migrate(root)
    assert applied == [r["version"] for r in recs[4:]]
    assert [r["version"] for r in applied_versions(root)] == [
        r["version"] for r in recs
    ]


def test_versions_are_strictly_increasing_and_unique():
    vs = [m.version for m in MIGRATIONS]
    assert vs == sorted(vs)
    assert len(vs) == len(set(vs))
