"""M5: publication reconciliation + tables API state machine."""

from __future__ import annotations

import pytest

from pgsink_spark.control import Publication, TablesAPI, reconcile
from pgsink_spark.imports.jobs import ImportJobStore

CATALOG = [
    ("public", "orders"),
    ("public", "customers"),
    ("public", "audit_log"),
    ("internal", "secrets"),
]


def _catalog_df(spark):
    return spark.createDataFrame(CATALOG, ["namespace", "name"])


@pytest.fixture()
def jobs(tmp_path):
    return ImportJobStore(str(tmp_path / "jobs.json"))


def test_reconcile_watched_schemas(spark):
    pub = Publication("pgsink")
    added, removed = reconcile(spark, _catalog_df(spark), pub, ["public"])
    assert added == [
        ("public", "audit_log"),
        ("public", "customers"),
        ("public", "orders"),
    ]
    assert removed == []
    # second tick is a no-op (diff is empty)
    added2, removed2 = reconcile(spark, _catalog_df(spark), pub, ["public"])
    assert added2 == [] and removed2 == []


def test_reconcile_include_exclude_and_drop(spark):
    pub = Publication("pgsink")
    added, _ = reconcile(
        spark, _catalog_df(spark), pub, ["public"],
        exclude=["public.audit_log"],
    )
    assert ("public", "audit_log") not in added

    # a table leaves the catalog → removed from the publication
    shrunk = spark.createDataFrame(
        [("public", "orders")], ["namespace", "name"]
    )
    added2, removed2 = reconcile(spark, shrunk, pub, ["public"])
    assert added2 == []
    assert removed2 == [("public", "customers")]
    assert pub.get_tables() == [("public", "orders")]

    # include list restricts to exactly those names
    pub2 = Publication("only")
    added3, _ = reconcile(
        spark, _catalog_df(spark), pub2, ["public"],
        include=["public.orders"],
    )
    assert added3 == [("public", "orders")]


def test_status_state_machine(jobs):
    pub = Publication("pgsink")
    api = TablesAPI(pub, jobs)

    # inactive everywhere before any action
    infos = {(t.namespace, t.name): t for t in api.list_tables(CATALOG)}
    assert infos[("public", "orders")].publication_status == "inactive"
    assert infos[("public", "orders")].import_status == "inactive"

    # add → active + scheduled (job exists, no cursor yet)
    job = api.add_table("public", "orders")
    t = {(x.namespace, x.name): x for x in api.list_tables(CATALOG)}[
        ("public", "orders")
    ]
    assert t.publication_status == "active"
    assert t.import_status == "scheduled"

    # progress → in_progress with row count
    jobs.update_progress(job.id, "500", 1000)
    t = {(x.namespace, x.name): x for x in api.list_tables(CATALOG)}[
        ("public", "orders")
    ]
    assert t.import_status == "in_progress"
    assert t.import_rows_processed_total == 1000

    # error → error (error set, not completed)
    jobs.record_error(job.id, "boom")
    t = {(x.namespace, x.name): x for x in api.list_tables(CATALOG)}[
        ("public", "orders")
    ]
    assert t.import_status == "error"

    # completion wins over error
    jobs.complete(job.id)
    t = {(x.namespace, x.name): x for x in api.list_tables(CATALOG)}[
        ("public", "orders")
    ]
    assert t.import_status == "complete"

    # stop → expired wins over everything, rows not reported
    api.add_table("public", "orders")  # newer job
    api.stop_table("public", "orders")
    t = {(x.namespace, x.name): x for x in api.list_tables(CATALOG)}[
        ("public", "orders")
    ]
    assert t.publication_status == "inactive"
    assert t.import_status == "expired"
    assert t.import_rows_processed_total == 0


def test_latest_job_wins(jobs):
    pub = Publication("pgsink")
    api = TablesAPI(pub, jobs)
    j1 = api.add_table("public", "orders")
    jobs.complete(j1.id)
    j2 = jobs.enqueue("default", "public", "orders")
    j2.created_at = j1.created_at + 10  # strictly newer
    t = {(x.namespace, x.name): x for x in api.list_tables(CATALOG)}[
        ("public", "orders")
    ]
    assert t.import_status == "scheduled"  # newest job, not the completed one


def test_find_or_create_publication_by_comment():
    """Discovery-by-comment (pkg/subscription/publication.go:22-89):
    the subscription id lives in the catalog comment; rediscovery
    returns the same incarnation; a recreated publication gets a new id
    and hence a new slot name (stale slots are never resumed into)."""
    from pgsink_spark.control.publication import (
        DiscoveredPublication,
        find_or_create_publication,
    )

    ids = iter(["id1", "id2"])
    catalog: dict = {}
    pub, created = find_or_create_publication(catalog, "pgsink", lambda: next(ids))
    assert created and pub.id == "id1"
    assert pub.replication_slot_name() == "pgsink_id1"

    # second tick finds the stamped publication — no new id consumed
    again, created = find_or_create_publication(catalog, "pgsink", lambda: next(ids))
    assert not created and again == pub

    # drop + recreate: the comment is gone, so a fresh id is stamped
    catalog["pgsink"] = DiscoveredPublication(oid=7, name="pgsink", id="")
    fresh, created = find_or_create_publication(catalog, "pgsink", lambda: next(ids))
    assert created and fresh.id == "id2"
    assert fresh.replication_slot_name() != pub.replication_slot_name()


def test_publication_sql_builders():
    from pgsink_spark.control.publication import (
        FIND_PUBLICATION_SQL,
        comment_publication_sql,
        create_publication_sql,
    )

    assert "obj_description(oid, 'pg_publication')" in FIND_PUBLICATION_SQL
    assert create_publication_sql("p").startswith('CREATE PUBLICATION "p"')
    # comments embed the id safely even when it contains a quote
    assert comment_publication_sql("p", "a'b") == 'COMMENT ON PUBLICATION "p" IS \'a\'\'b\''
