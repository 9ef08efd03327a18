"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`tamar_spark.queries`; each query there is a
(Spark DataFrame, DuckDB SQL) pair with aligned column names/types.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: event-time session windows
    (gap 30 min) per user with incremental aggregation."""
    from tamar_spark.queries import QUERIES

    return QUERIES["session_agg"](spark, "/root/testdata/sf0.001")


# The driver evaluates registration order and caps the correctness run at 50
# queries per round, so registration is a priority queue.  Since round 6 the
# order is COMPUTED from the CORRECTNESS_r*.json ledger in this directory
# (r5 VERDICT task 1: rotation must not depend on hand-maintained lists):
# stalest-first — a query's priority is the last round a driver row verified
# it, with never-verified (new) queries and the entries below (queries whose
# SEMANTICS changed this round, so their old rows no longer attest the
# current code) at the head.  Ties keep stable registration order.  A test
# (tests/test_oracle.py::test_rotation_is_stalest_first) recomputes this
# independently and pins both the ordering invariant and head membership.
_CHANGED_THIS_ROUND = [
    # r6: CDC pair reworked per ADVICE — insert keys derived from the
    # base's max key (disjointness by construction) and the incremental
    # path's broadcast restructured to a semi-join prefilter so the change
    # batch genuinely is the build side.
    "cdc_incremental_agg",
    "cdc_upsert",
    # r6: PQ rerank depth tuned 20 -> 50 after the recall@5 measurement
    # (BASELINE.md ANN recall table) — output rows differ from r5.
    "embed_pq_topk",
]


def _last_checked() -> dict[str, int]:
    """Latest driver round that verified each query, from the artifact
    ledger committed next to this file."""
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for q in rows:
            last[q] = max(last.get(q, 0), rnd)
    return last


def _ordered(mapping: dict) -> dict:
    last = _last_checked()
    changed = set(_CHANGED_THIS_ROUND)

    def prio(name: str) -> int:
        return 0 if name in changed else last.get(name, 0)

    names = sorted(mapping, key=lambda n: prio(n))  # stable: ties keep order
    return {k: mapping[k] for k in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tamar_spark.queries import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every registered query has one
    (the approximate operators carry bit-identical deterministic twins,
    see the LSH/IVF oracle builders in tamar_spark.queries)."""
    from tamar_spark.queries import ORACLES

    return _ordered(dict(ORACLES))
