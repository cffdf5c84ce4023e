"""Executed-plan readers (string-level, version-tolerant).

These parse ``queryExecution().executedPlan().toString()`` /
``explain("formatted")`` output rather than walking JVM plan nodes —
stable across Spark minor versions and cheap enough to run in tests.
With AQE enabled the final plan may still contain unmaterialized
``AdaptiveSparkPlan`` wrappers; triggering an action first (count/noop
write) makes the adaptive plan final.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, run: bool = True) -> str:
    """Final physical plan string.

    The action must run through the DataFrame's *own* queryExecution
    (``collect``) — a ``write`` clones the plan, leaving this one's
    AdaptiveSparkPlan unfinalized (isFinalPlan=false, no codegen ids).
    Intended for test-scale data; don't call with run=True on huge
    frames.
    """
    if run:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into data sources (PushedFilters: [...]).

    Parsed from ``explain("formatted")`` — the compact plan string
    truncates long filter lists.
    """
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan read schemas — the column-pruning audit.

    Returns one column-name list per FileScan/BatchScan in the plan; a
    scan reading more columns than the query touches is a pruning miss.
    """
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if c.strip()
        ]
        out.append(cols)
    return out


def _final_section(plan: str) -> str:
    """AQE plan strings carry '== Final Plan ==' and '== Initial Plan =='
    sections; audits must read only the final one."""
    if "== Final Plan ==" in plan:
        plan = plan.split("== Final Plan ==", 1)[1]
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    return plan


def exchange_count(df: DataFrame, run: bool = True) -> int:
    """Number of shuffle exchanges in the final plan (lower is better;
    broadcast exchanges are not counted)."""
    plan = _final_section(executed_plan(df, run=run))
    return len(re.findall(r"ShuffleExchange|Exchange (?:hash|range|Single)", plan))


def broadcast_join_count(df: DataFrame, run: bool = True) -> int:
    plan = _final_section(executed_plan(df, run=run))
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when aggregation is split partial/final (map-side combine)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(re.search(r"partial_|PartialAggregate|partial aggregation", plan)) or (
        "HashAggregate" in plan and plan.count("HashAggregate") >= 2
    )


def codegen_span_count(df: DataFrame, run: bool = True) -> int:
    """Whole-stage-codegen region count (wider regions = fewer is better
    for the same plan size; zero means everything fell off codegen)."""
    plan = executed_plan(df, run=run)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
