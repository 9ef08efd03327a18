"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`tamar_spark.queries`; each query there is a
(Spark DataFrame, DuckDB SQL) pair with aligned column names/types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: event-time session windows
    (gap 30 min) per user with incremental aggregation."""
    from tamar_spark.queries import QUERIES

    return QUERIES["session_agg"](spark, "/root/testdata/sf0.001")


# The driver evaluates registration order and may cap how many queries it
# reaches per round, so registration is a priority queue (VERDICT r1/r2
# rotation discipline):
#   1. queries whose engine or oracle CHANGED this round (round 3) — they
#      must re-earn a driver row;
#   2. queries whose last driver row is round 1 (the r2 rotation didn't
#      reach them) — two-round-old rows, next in line;
#   3. queries with a fresh r2 row and no change since.
_CHANGED_THIS_ROUND = [
    # r3 NEW queries (queries_pipeline.py): decontamination, repetition
    # quality filters, BM25 search, sequence packing, co-occurrence lift —
    # never driver-checked, so they go first.
    "decontaminate", "repetition_filters", "bm25_search",
    "pack_sequences", "cooccur_lift",
    # r3 changes: percentile/HLL self-verify shapes, ANN oracle twins,
    # deterministic outer join, jaccard cap, vectorized stateful walk,
    # session eviction boundary, ivf md5 seed, LSH auto-sizing
    "approx_percentile_value", "approx_distinct_users",
    "embed_lsh_topk", "embed_ivf_topk",
    "streaming_stream_outer_join", "streaming_session_process",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_clusters_star",
    "stateful_event_numbering", "dedup_embedding_lsh",
    "streaming_stream_join",
]

_R1_ONLY = [
    "sliding_agg", "filter_map", "keyed_count", "running_total",
    "q1_pricing", "q3_shipping", "q5_region_revenue", "window_rank",
    "lead_lag", "distinct_agg", "rollup_sales", "set_ops", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "text_stats", "doc_quality",
    "lang_id", "doc_fingerprint", "binary_meta", "semi_anti_join",
    "cube_sales", "json_props", "word_freq", "range_join_pairs",
    "pandas_udf_bucket", "streaming_tumbling_agg", "streaming_dedup",
    "q4_order_priority", "q6_forecast_revenue", "q7_trade_volume",
    "q8_market_share", "q9_product_profit", "q10_returned_top",
    "q14_promo_share", "q15_top_supplier", "q17_small_quantity",
    "q18_large_orders", "q19_bracket_revenue", "q22_idle_customers",
    "stat_agg",
]


def _ordered(mapping: dict) -> dict:
    head = [k for k in _CHANGED_THIS_ROUND + _R1_ONLY if k in mapping]
    seen = set(head)
    out = {k: mapping[k] for k in head}
    out.update({k: v for k, v in mapping.items() if k not in seen})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tamar_spark.queries import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check for the
    approximate operators: simhash pairs, LSH top-k)."""
    from tamar_spark.queries import ORACLES

    return _ordered(dict(ORACLES))
