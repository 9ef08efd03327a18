#!/usr/bin/env python
"""Scaling probe: flagship plans on 1x/4x/16x/32x replicated sf0.1 inputs.

Replicates the fact tables in memory (key-shifted per copy, so cardinality
grows with the data — the horizontal scale model) and times three plan
shapes that dominate the engine:

- session_agg   : shuffle + session-window aggregation over events
- q1_agg        : scan-heavy multi-aggregate over lineitem
- join_agg      : lineitem ⋈ orders shuffle join + aggregation
- lsh_dedup     : LSH-bucketed embedding near-dup (signature GEMM →
                  bucket shuffle → in-bucket GEMM verify) over embeddings

Near-linear wall-clock growth here means the plans have no super-linear
step (no cross products, no driver collects, no per-key state blowup) —
the local evidence one can produce for 100 TB readiness.  Prints one JSON
line: {"scales": [1,2,4,8], "queries": {name: [sec, ...]}}.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, functions as F

from tamar_spark.env import get_spark
from tamar_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.1"
SCALES = [1, 4, 16, 32]


def replicate(df: DataFrame, k: int, key_cols: list[str]) -> DataFrame:
    """k key-shifted copies: copy i shifts every key by i * 10^10 so key
    cardinality scales with volume."""
    parts = []
    for i in range(k):
        p = df
        for c in key_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * 10_000_000_000))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(
        app_name="tamar-scale-probe",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, SF_DIR, "events")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    for df in (events, lineitem, orders):
        df.count()  # warm scans

    def session_agg(k):
        e = replicate(events, k, ["user_id", "event_id"])
        return (
            e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )

    def q1_agg(k):
        l = replicate(lineitem, k, ["l_orderkey"])
        return l.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sq"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sd"),
            F.avg("l_discount").alias("ad"),
            F.count(F.lit(1)).alias("n"),
        )

    def join_agg(k):
        # the fact-fact join must be a shuffle join: a replicated in-memory
        # union fools the static size estimate into picking a broadcast that
        # kills the driver at 32x — exactly the misestimation hazard AQE
        # exists for; the merge hint pins the scale-safe physical choice
        l = replicate(lineitem, k, ["l_orderkey"])
        o = replicate(orders, k, ["o_orderkey"])
        return (
            l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        )

    embeddings = load_table(spark, SF_DIR, "embeddings")
    embeddings.count()

    def lsh_dedup(k):
        # Key-shifted copies ROTATED per copy (deterministic sign pattern on
        # the coordinates, ≥1/5 of dims flipped between any two copies →
        # cross-copy cosine ≤ 0.6) so replicas aren't trivial duplicates of
        # each other.  n_bits grows with the corpus (6 + log2(k)) so
        # expected bucket occupancy stays constant — the documented sizing
        # rule that keeps Σ bucket² (scored pairs) LINEAR in corpus size.
        import math

        from tamar_spark.operators.dedup_embedding import lsh_cosine_pairs

        parts = []
        for i in range(k):
            sign_arr = F.array(
                *[F.lit(float(1 - 2 * ((i >> (j % 5)) & 1))) for j in range(64)]
            )
            rotated = F.zip_with(
                F.col("embedding").cast("array<double>"), sign_arr, lambda x, s: x * s
            )
            parts.append(
                embeddings.select(
                    (F.col("vec_id") + F.lit(i * 10_000_000_000)).alias("vec_id"),
                    rotated.alias("embedding"),
                )
            )
        e = parts[0]
        for p in parts[1:]:
            e = e.unionByName(p)
        n_bits = 6 + round(math.log2(k)) if k > 1 else 6
        return lsh_cosine_pairs(e, threshold=0.9, dim=64, n_bits=n_bits)

    results = {}
    for name, fn in [
        ("session_agg", session_agg),
        ("q1_agg", q1_agg),
        ("join_agg", join_agg),
        ("lsh_dedup", lsh_dedup),
    ]:
        times = []
        for k in SCALES:
            t0 = time.perf_counter()
            fn(k).count()
            times.append(round(time.perf_counter() - t0, 2))
        results[name] = times
    print(json.dumps({"sf_base": 0.1, "scales": SCALES, "queries": results}))


if __name__ == "__main__":
    main()
