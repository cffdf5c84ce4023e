"""pgsink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lawrencejones/pgsink (CDC changelog model,
import/backfill scans, sink routing + read-time compaction), plus the
large-scale analytics surface (joins/aggs/windows/set-ops, dedup,
similarity search, text analysis) built Spark-first on DataFrame/SQL.

Layout:
  changelog/  envelope schema, operation derivation, type registry, tables
  sources/    fixture loaders, keyset import scan, pgoutput decoder
  operators/  relational oracle corpus, compaction, dedup, similarity, text
  sinks/      file (ndjson) sink, warehouse (parquet raw + view), router
  streaming/  windows, watermark dedup, micro-batch CDC pipeline
  control/    import-job queue, table reconciliation
  plans/      plan inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
