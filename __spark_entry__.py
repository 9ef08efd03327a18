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
# stalest-first — a query's priority is the last round a GREEN driver row
# verified it (r6 ADVICE: rows with a non-null err or a failed match don't
# attest anything, so a failing query stays at the head), with
# never-verified (new) queries and semantics-changed entries at the head.
# A semantics change is recorded below with the round it happened in; once
# a green ledger row from that round or later exists, the entry is spent
# and the query rejoins the normal rotation automatically (r6 ADVICE: the
# old unscoped list pinned entries to the head forever until someone
# remembered to empty it).  Ties keep stable registration order.  A test
# (tests/test_oracle.py::test_rotation_is_stalest_first) recomputes this
# independently and pins both the ordering invariant and head membership.
_CHANGED_IN_ROUND = {
    # r6: CDC pair reworked per ADVICE (spent once a green r6+ row exists).
    "cdc_incremental_agg": 6,
    "cdc_upsert": 6,
    # r6: PQ rerank depth tuned 20 -> 50 (spent by the green r6 row).
    "embed_pq_topk": 6,
    # r7: edit_sim recomputed with the cross-engine round_ieee form in both
    # engines (r6 ADVICE medium) — the r6 row attests the old rounding.
    "dedup_edit_distance": 7,
    # r7: view0-delta join widened to full_outer so change-batch-only
    # groups route through the rescan (r6 ADVICE).
    "cdc_incremental_minmax": 7,
    # r7: bloom rebuilt as a sized dense xxhash64 filter (results provably
    # unchanged — exact join removes FPs — but a mis-built filter would
    # DROP rows, so the attested row should postdate the rewrite).
    "bloom_join_prune": 7,
    # r8: kcore peel rewritten (one-sided semi-join with the dominance
    # proof, pre-partitioned sym, fused checkpoint+count, round budget
    # aligned to the oracle per r7 ADVICE) — fixpoint provably unchanged,
    # but an engine rewrite should not ride an old attestation.
    "graph_kcore": 8,
    # r8: oracle tiebreak aligned to max(struct)'s highest-shard rule and
    # shard cast to bigint on the Spark side (r7 ADVICE).
    "rendezvous_shards": 8,
    # r9: bpe_learn grew the measured-vocab driver-local tier (r8 VERDICT
    # task 2) — merges provably identical (two-tier property test), but
    # every kernel-sharing query should carry a fresh attestation.
    "bpe_merges": 9,
    "bpe_encode": 9,
    "bpe_fertility": 9,
    "corpus_tokenize_pack": 9,
    "corpus_e2e": 9,
    # r10 (supersedes the r9 broadcast-vs-shuffle-hash entry): triangles
    # persist scoped by a per-invocation cache lease and the dead kv
    # column dropped from the cached frame (r9 task 4) — results provably
    # unchanged, plan rewrite carries a fresh attestation.
    "graph_triangles": 10,
    # r10: IVF geometry is size-derived in-plan (r9 task 3) — nlist =
    # ceil(sqrt(n)), probe nlist/4; results CHANGE (finer lists, higher
    # recall at the same scan fraction), oracle derives the identical
    # geometry via scalar subqueries.
    "embed_ivf_topk": 10,
    "embed_abtt_ivf_topk": 10,
    # r10 (supersedes the r9 window+canonical-pair entry): star-CC's
    # two-branch unions rewritten as single-reference explodes (r9
    # task 5) — identical row multisets per round, re-attested.
    "dedup_clusters_star": 10,
    # r11: IVFPQ residual-PQ config raised 4×16 → 8×16 codes (r10 VERDICT
    # task 6: with the size-derived coarse geometry the PQ ceiling binds;
    # 8 subquantizers lift recall@5 past the rerank window at ~2 bytes/vec
    # extra).  Results CHANGE; the oracle unrolls the same 8-term ADC sum.
    "embed_ivfpq_topk": 11,
    # r14: canonical_url grew percent-encoding normalization,
    # dot-segment resolution, and userinfo handling (spent by the
    # green r14 row); r15: percent_normalize grew the leading bare-'%'
    # protection pass (r14 ADVICE — the chain is now idempotent on ALL
    # input).  The fixture is bare-%-free so the registered output is
    # provably unchanged, but the kernel-rewrite convention applies to
    # every query riding the chain.
    "url_canonicalize": 15,
    # r14: the shared streaming-dedup handler changed (timer-tick fix +
    # store_shingles refactor through the same code path) — results
    # provably unchanged at the fixture's second-granularity
    # timestamps, but the bpe-family rule applies: EVERY query sharing
    # a rewritten kernel carries a fresh attestation (r9 precedent
    # pinned all five bpe-kernel queries; the sig sibling attests only
    # the estimator verification branch, not the exact-shingle path
    # this row's r13 attestation covered).
    "streaming_dedup_minhash": 14,
    # r15: crawl_normalize rides the rewritten percent chain AND
    # changed semantics on its own — entity-encoded splice halves (the
    # r14 ADVICE fixture-purity item) plus the IDN/punycode fixture
    # shape (r14 task 4); paragraph_filter's reassembly was rewritten
    # linear (r14 task 5 — output provably unchanged, equality
    # property-tested on ≥1k-paragraph docs).
    "crawl_normalize": 15,
    "paragraph_filter": 15,
}
# One entry per query name, enforced: a duplicate key in this literal is
# silently last-wins in Python, and a LOWER-round duplicate added later
# would un-pin a head entry (r10 VERDICT task 4).  The AST guard in
# tests/test_oracle.py::test_changed_in_round_has_no_duplicate_keys
# rejects any duplicate at test time.


def _last_checked() -> dict[str, int]:
    """Latest driver round whose row VERIFIED each query — green only:
    err null and no explicit mismatch.  (rows_match/hash_match are None
    for rows-only checks; only False disqualifies.)"""
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
        for q, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("hash_match") is not False
                and row.get("schema_match") is not False
            )
            if green:
                last[q] = max(last.get(q, 0), rnd)
    return last


def _ordered(mapping: dict) -> dict:
    last = _last_checked()

    def prio(name: str) -> int:
        lg = last.get(name, 0)
        return 0 if lg < _CHANGED_IN_ROUND.get(name, 0) else lg

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
