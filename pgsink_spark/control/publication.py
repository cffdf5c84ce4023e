"""Publication state + table reconciliation.

Reference behavior (pkg/subscription/manager.go:120-191,
publication.go:129-196): poll the catalog for BASE TABLEs in watched
schemas, apply include/exclude lists, diff against the currently
published set, and update the publication — all under an advisory-lock
session. The relational core of that loop is exactly two anti-joins
(`watched − published` = to add, `published − watched` = to remove),
computed here with the changelog table set-ops so Catalyst broadcasts
the small side.

The publication itself is config state: a named set of (namespace,
name). Concurrency control is a driver-side lock (the advisory-lock
analogue; swap for a Delta txn in multi-driver deployments).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsink_spark.changelog.tables import KEYS, table_diff


@dataclass
class Publication:
    """Named published-table set (reference: pg publication + pgsink id)."""

    name: str
    tables: set[tuple[str, str]] = field(default_factory=set)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def to_df(self, spark: SparkSession) -> DataFrame:
        if not self.tables:
            return spark.createDataFrame([], "namespace string, name string")
        return spark.createDataFrame(sorted(self.tables), KEYS)

    def get_tables(self) -> list[tuple[str, str]]:
        with self._lock:
            return sorted(self.tables)

    def set_tables(self, tables: list[tuple[str, str]]) -> None:
        """Atomic replace (reference ALTER PUBLICATION ... SET TABLE)."""
        with self._lock:
            self.tables = set(tables)

    def add(self, namespace: str, name: str) -> None:
        with self._lock:
            self.tables.add((namespace, name))

    def remove(self, namespace: str, name: str) -> None:
        with self._lock:
            self.tables.discard((namespace, name))


def filter_watched(
    catalog: DataFrame,
    schemas: list[str],
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Watched-table selection: schema IN-list + include/exclude names.

    Reference semantics (pkg/subscription/manager.go:148-191): the
    exclude list always wins; a non-empty include list restricts to
    exactly those names. Names are '<namespace>.<name>' qualified.
    """
    qualified = F.concat_ws(".", F.col("namespace"), F.col("name"))
    out = catalog.where(F.col("namespace").isin(schemas))
    if exclude:
        out = out.where(~qualified.isin(exclude))
    if include:
        out = out.where(qualified.isin(include))
    return out


def reconcile(
    spark: SparkSession,
    catalog: DataFrame,
    publication: Publication,
    schemas: list[str],
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """One manager tick: returns (added, removed) and applies them.

    ``catalog`` is a (namespace, name) DataFrame of existing BASE TABLEs
    (from a JDBC information_schema read in a live deployment).
    """
    watched = filter_watched(catalog, schemas, include, exclude)
    published = publication.to_df(spark)
    to_add = [
        (r["namespace"], r["name"])
        for r in table_diff(watched, published).collect()
    ]
    to_remove = [
        (r["namespace"], r["name"])
        for r in table_diff(published, watched).collect()
    ]
    current = set(publication.get_tables())
    publication.set_tables(sorted((current | set(to_add)) - set(to_remove)))
    return sorted(to_add), sorted(to_remove)


# ---------------------------------------------------------------------------
# Discovery by catalog comment (reference pkg/subscription/publication.go).
#
# The reference stamps each publication with a unique subscription id
# stored as the publication's catalog COMMENT, then discovers it back via
# `obj_description(oid, 'pg_publication')` (publication.go:42-89). The
# replication slot is named `<publication>_<id>`, which is what catches a
# dropped-and-recreated publication: the new id no longer matches the old
# slot's suffix, so the stale slot is never resumed into.
# ---------------------------------------------------------------------------

FIND_PUBLICATION_SQL = (
    "SELECT oid, pubname AS name, "
    "obj_description(oid, 'pg_publication') AS id "
    "FROM pg_publication WHERE pubname = %s LIMIT 1"
)


def create_publication_sql(name: str) -> str:
    """DDL for an empty publication (publication.go:47-53)."""
    return f'CREATE PUBLICATION "{name}" WITH (publish = \'insert, update, delete\')'


def comment_publication_sql(name: str, subscription_id: str) -> str:
    """Stamp the subscription id into the catalog comment."""
    sid = subscription_id.replace("'", "''")
    return f"COMMENT ON PUBLICATION \"{name}\" IS '{sid}'"


@dataclass(frozen=True)
class DiscoveredPublication:
    """A publication found (or created) in the catalog, with its id."""

    oid: int
    name: str
    id: str

    def replication_slot_name(self) -> str:
        """`<name>_<id>` (publication.go:99-104): the id proves the slot
        was created against THIS incarnation of the publication."""
        return f"{self.name}_{self.id}"


def find_or_create_publication(
    catalog: dict[str, DiscoveredPublication],
    name: str,
    id_factory,
) -> tuple[DiscoveredPublication, bool]:
    """Find-or-create against a catalog mapping (publication.go:22-40).

    ``catalog`` abstracts the pg_publication lookup — a live deployment
    backs it with FIND_PUBLICATION_SQL over JDBC; tests use a dict. A
    found publication whose comment is missing (id None/empty) is
    treated as foreign and re-stamped with a fresh id, matching the
    reference's create-then-comment transaction. Returns
    (publication, created).
    """
    existing = catalog.get(name)
    if existing is not None and existing.id:
        return existing, False
    pub = DiscoveredPublication(
        oid=existing.oid if existing else 0, name=name, id=id_factory()
    )
    catalog[name] = pub
    return pub, True
