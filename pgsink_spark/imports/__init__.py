"""Batch import (backfill) plane: keyset scans + the import-job queue.

Reference: pgsink backfills existing table contents with cursor-paginated
keyset scans driven by a persisted job queue
(pkg/imports/import.go, importer.go, manager.go, worker.go;
pgsink.import_jobs in structure.sql:36-50).
"""

from pgsink_spark.imports.importer import Importer, ImportResult
from pgsink_spark.imports.jobs import ImportJob, ImportJobStore
from pgsink_spark.imports.keyset import keyset_batch, partitioned_snapshot

__all__ = [
    "ImportJob",
    "ImportJobStore",
    "ImportResult",
    "Importer",
    "keyset_batch",
    "partitioned_snapshot",
]
