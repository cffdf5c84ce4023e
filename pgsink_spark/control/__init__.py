"""Control plane: publications, reconciliation, tables API.

Reference: the subscription/publication managers
(pkg/subscription/manager.go, publication.go) and the goa HTTP API
(api/tables.go, api/subscriptions.go). Here the API is a plain Python
facade over Spark-SQL reconciliation queries and the import-job store —
a FastAPI/CLI layer would call these functions 1:1.
"""

from pgsink_spark.control.publication import Publication, reconcile
from pgsink_spark.control.tables_api import TableInfo, TablesAPI

__all__ = ["Publication", "TableInfo", "TablesAPI", "reconcile"]
