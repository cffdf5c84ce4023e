"""Physical-plan introspection: the scale audit toolkit.

The engine's 100 TB posture rests on properties of the *physical* plan,
not the code: filters reaching the scan, small dimensions broadcast,
aggregates partial-before-shuffle, expressions inside whole-stage
codegen. These helpers read those properties off an executed plan so
tests can pin them — a plan regression (e.g. a lost pushdown after a
refactor) fails CI the same way a wrong result would.
"""

from pgsink_spark.plans.audit import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    executed_plan,
    has_partial_aggregate,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "broadcast_join_count",
    "codegen_span_count",
    "exchange_count",
    "executed_plan",
    "has_partial_aggregate",
    "pushed_filters",
    "scan_columns",
]
