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


# Queries that already earned a driver CORRECTNESS row in round 1.  The
# driver evaluates registration order and may cap how many it reaches, so we
# register not-yet-driver-checked queries FIRST each round to rotate hard
# coverage across the full inventory (VERDICT r1 "Next round" item 2).
_CHECKED_PRIOR_ROUNDS = [
    # first: prior-checked queries whose engine/oracle changed this round
    # (session gap-boundary fix, asof strategies, similarity laziness) —
    # they must re-earn a driver row even if the driver caps its count
    "session_agg", "session_stats", "streaming_session_agg",
    "asof_join_latest_order", "embed_cosine_topk", "embed_lsh_topk",
    # then the untouched remainder of round 1's checked set
    "tumbling_agg", "sliding_agg",
    "filter_map", "keyed_count", "running_total", "q1_pricing", "q3_shipping",
    "q5_region_revenue", "window_rank", "lead_lag", "distinct_agg",
    "rollup_sales", "set_ops", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "text_stats", "doc_quality",
    "lang_id", "doc_fingerprint", "binary_meta",
    "semi_anti_join", "cube_sales", "json_props", "word_freq",
    "range_join_pairs", "pandas_udf_bucket", "streaming_tumbling_agg",
    "streaming_stream_join", "streaming_dedup", "q4_order_priority",
    "q6_forecast_revenue", "q7_trade_volume", "q8_market_share",
    "q9_product_profit", "q10_returned_top", "q14_promo_share",
    "q15_top_supplier", "q17_small_quantity", "q18_large_orders",
    "q19_bracket_revenue", "q22_idle_customers", "stat_agg",
]


def _ordered(mapping: dict) -> dict:
    prior = set(_CHECKED_PRIOR_ROUNDS)
    fresh = {k: v for k, v in mapping.items() if k not in prior}
    rest = {k: mapping[k] for k in _CHECKED_PRIOR_ROUNDS if k in mapping}
    return {**fresh, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tamar_spark.queries import QUERIES

    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check for the
    approximate operators: simhash pairs, LSH top-k)."""
    from tamar_spark.queries import ORACLES

    return _ordered(dict(ORACLES))
