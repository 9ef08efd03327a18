"""Plan inspection and scale utilities.

The reference has no optimizer at all (SURVEY §4.1) — our engine's contract
is that every operator records a declarative plan Catalyst can optimize.
These helpers make that contract *testable*: tests assert that filters reach
the parquet scan, that dimension joins broadcast, and that JVM-only
operators ship no Python stages.

Also home to skew tooling (:func:`salted_join`) — AQE's skew-join handles
skewed *shuffle* partitions automatically, but a pathological hot key inside
one partition still needs salting at 100 TB.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "executed_plan",
    "pushed_filters",
    "has_python_stage",
    "broadcast_join_count",
    "shuffle_count",
    "salted_join",
]


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (after AQE initial planning)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> List[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    out = []
    for chunk in executed_plan(df).split("PushedFilters: [")[1:]:
        out.append(chunk.split("]")[0])
    return [c for c in out if c.strip()]


def has_python_stage(df: DataFrame) -> bool:
    """True if the plan contains any Python-evaluation operator (the slow
    path: row-at-a-time or Arrow-batched UDF stages)."""
    plan = executed_plan(df)
    return any(
        marker in plan
        for marker in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
            "MapInPandas",
        )
    )


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators that execute for THIS query —
    the metric to minimize; every one is a full network re-distribution.

    Walks the physical-plan tree and stops at InMemoryTableScan
    boundaries: a persisted subtree's build cost is paid once at cache
    materialization, not per consumer, so counting its exchanges per
    consumer (as the old text-scrape did) overstated cached plans ~4×.
    Only hash/range repartitionings count — BroadcastExchange is a
    dimension-table broadcast and Exchange SinglePartition is the
    final gather of already-reduced partial-agg rows; neither moves
    fact-scale data."""
    root = df._jdf.queryExecution().executedPlan()
    count = 0
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if "InMemoryTableScan" in name:
            continue
        if name.startswith("Exchange"):
            part = node.outputPartitioning().toString().lower()
            if "hashpartitioning" in part or "rangepartitioning" in part:
                count += 1
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return count


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    ``salt`` sub-keys and explode the right side to match.

    Use when one join key value dominates (power-law keys at 100 TB) and the
    build side is too large to broadcast: the hot key's rows spread over
    ``salt`` partitions instead of one straggler.  Right side is replicated
    ``salt``× — keep it the smaller input.  AQE's skew-join splitting
    (enabled in our session factory) covers most cases; this is the explicit
    tool for when it can't (e.g. aggregation-feeding joins that AQE won't
    split).
    """
    l = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")
