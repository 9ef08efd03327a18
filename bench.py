#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline query set (each executed to
completion via a count/collect action).  Runs on local[$SPARK_GRAFT_CPUS]
with the engine's tuned session (AQE, broadcast joins, pruned scans).
"""

from __future__ import annotations

import json
import os
import time


HEADLINE = [
    "session_agg",
    "tumbling_agg",
    "sliding_agg",
    "keyed_count",
    "q1_pricing",
    "q3_shipping",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_top",
    "q18_large_orders",
    "window_rank",
    "asof_join_latest_order",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "embed_cosine_topk",
    "embed_ivf_topk",
    "doc_quality",
    "stateful_event_numbering",
    "streaming_session_agg",
    "streaming_stream_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from tamar_spark.env import get_spark
    from tamar_spark.queries import QUERIES

    spark = get_spark(app_name="tamar-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: JVM codegen + parquet footer reads, so the first timed
    # query doesn't absorb session startup cost
    from tamar_spark.sources import load_table

    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    timings = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
