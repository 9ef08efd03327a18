"""Iterative DataFrame algorithms: Lloyd's k-means and weighted PageRank.

LLM-pipeline extension surface (SURVEY §2.7) — absent in the reference
(src/lib.rs has no iterative operators; its closest primitive is keyed
state, src/lib.rs:323-361).  Corpus pipelines need both: k-means for
embedding-space clustering (domain mixing, dedup-cluster summarization,
IVF coarse quantizers) and PageRank for link/citation-graph quality
weighting.

Both follow the standard Spark iterative pattern: a fixed number of
iterations, each a pure DataFrame transformation, with the loop unrolled
in the driver while all DATA stays distributed — no ``collect()``; scalars
(N, centroids) thread through broadcast joins.  Lineage grows linearly
with iterations; callers running many iterations should
``localCheckpoint()`` between rounds (documented, not needed for the
fixed 2-3 iterations registered here).

Determinism (the oracle-hash requirement): every floating-point value is
produced by a fixed-order chain of exactly-rounded IEEE ops identical in
Spark and DuckDB, and every AGGREGATED float is first rounded then summed
as DECIMAL — decimal addition is associative, so partial-aggregation
order (which Spark does not guarantee) cannot change the result.
"""

from __future__ import annotations

from typing import Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window, functions as F

from tamar_spark.operators.cache import CacheLease as _CacheLease, scope_caches
from tamar_spark.operators.similarity import dot

__all__ = ["kmeans", "kmeans_centroids", "pagerank"]


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column, fixed iteration count.

    Returns ``(id_col, cluster, dist)`` — the assignment after ``iters``
    rounds and the squared L2 distance to the winning centroid (rounded
    to 6 decimals).  Deterministic end-to-end: init centroids are the
    vectors of the ``k`` smallest ids (k-means++ would need an RNG),
    ties in the argmin break on the lower cluster id, and centroid means
    are exact DECIMAL sums of 6-decimal-rounded components divided in
    one double op — so the result is reproducible across runs, partition
    layouts, and engines.

    Scale (100 TB): the assign step is a broadcast cross join against k
    centroid rows (k·dim doubles — KBs) folded JVM-side via
    ``zip_with``/``aggregate``; the argmin is ``min(struct)`` with
    map-side partial aggregation, so each iteration shuffles once on the
    id.  The update step explodes to (cluster, dim) granularity —
    k·dim result rows — with partial decimal sums map-side; nothing
    driver-side ever holds more than the k centroids.
    """
    cent, assign, update, lease = _kmeans_plan(df, k, id_col, vec_col)
    for _ in range(iters - 1):
        cent = update(assign(cent))
    out = assign(cent).select(
        F.col("_id").alias(id_col),
        "cluster",
        F.round("d", 6).alias("dist"),
    )
    out._tamar_cache_lease = lease
    return out


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The centroid TABLE the final :func:`kmeans` assignment uses —
    ``(cluster int, _c array<double>)`` after ``iters − 1`` Lloyd update
    rounds (``iters=1`` returns the deterministic k-smallest-id seed).
    Same engine, same fixed-order float chains and decimal-summed means
    as :func:`kmeans`, so the components are bit-identical to the DuckDB
    twin's unrolled CTEs.  Feeds ``similarity.ivf_topk(centroids=)`` —
    the trained-quantizer production path: train once, materialize the
    k-row table, and every subsequent index build is a broadcast join
    against it (no corpus pre-flight).  Empty clusters drop out of the
    update (both engines identically), so the row count can be < k."""
    cent, assign, update, lease = _kmeans_plan(df, k, id_col, vec_col)
    for _ in range(iters - 1):
        cent = update(assign(cent))
    out = cent.select(F.col("cluster").cast("int").alias("cluster"), "_c")
    out._tamar_cache_lease = lease
    return out


def _kmeans_plan(df: DataFrame, k: int, id_col: str, vec_col: str):
    """Shared Lloyd's engine for :func:`kmeans` / :func:`kmeans_centroids`:
    returns ``(cent0, assign, update, lease)`` — the deterministic seed
    table, the two step closures (both close over the persisted input),
    and the cache lease scoping that persist to the returned frame's
    lifetime (the triangles pattern, r10: an internal persist must not
    outlive its consumer — callers attach the lease to what they
    return, so dropping the result unpersists the training cache;
    materializing via ``localCheckpoint`` then dropping the handle
    releases it immediately after training)."""
    emb = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    w0 = Window.orderBy("_id")
    cent = (
        emb.orderBy("_id")
        .limit(k)
        .select(
            (F.row_number().over(w0) - 1).cast("int").alias("cluster"),
            F.col("_v").alias("_c"),
        )
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        # |v - c|^2 expanded as v.v - 2 v.c + c.c: three fixed-order folds,
        # the same expression the DuckDB twin evaluates via
        # list_dot_product, so the doubles compared in the argmin are
        # bit-identical across engines.
        v, c = F.col("_v"), F.col("_c")
        d2 = dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)
        scored = emb.crossJoin(F.broadcast(cent_df)).select(
            "_id", F.struct(d2.alias("d"), F.col("cluster")).alias("_s")
        )
        m = scored.groupBy("_id").agg(F.min("_s").alias("_m"))
        return m.select(
            "_id", F.col("_m.cluster").alias("cluster"), F.col("_m.d").alias("d")
        )

    def update(asg: DataFrame) -> DataFrame:
        ex = asg.join(emb, "_id").select(
            "cluster", F.posexplode("_v").alias("pos", "val")
        )
        sums = ex.groupBy("cluster", "pos").agg(
            F.sum(F.round(F.col("val"), 6).cast("decimal(28,6)")).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        dims = sums.select(
            "cluster",
            F.struct(
                "pos",
                F.round(F.col("s").cast("double") / F.col("cnt"), 6).alias("c"),
            ).alias("pc"),
        )
        # array_sort on (pos, c) structs orders by pos — rebuilds the
        # centroid vector positionally regardless of shuffle order
        return (
            dims.groupBy("cluster")
            .agg(F.array_sort(F.collect_list("pc")).alias("pcs"))
            .select(
                "cluster", F.transform("pcs", lambda s: s["c"]).alias("_c")
            )
        )

    return cent, assign, update, _CacheLease(emb._jdf)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    nodes: Optional[DataFrame] = None,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    ``edges`` is ``(src, dst, weight)`` with integer weights; ``nodes``
    (one ``node`` column) defaults to the vertices appearing in ``edges``.
    Returns ``(node, pr)``.  Each round an edge carries
    ``pr(src) * w / out_w(src)`` and every node receives
    ``(1-d)/N + d * Σ inbound`` — the simple-decay variant (mass at
    dangling nodes is not redistributed), computed identically by the
    DuckDB twin.

    Determinism: per-edge contributions are single-chain double ops
    rounded to 12 decimals, then summed as DECIMAL(28,12) — exact and
    order-independent — before the damped update re-rounds to 12.  Both
    roundings use ``floor(x·10¹² + 0.5)/10¹²`` (pure IEEE ops, identical
    in Spark and DuckDB) rather than ``round(double, 12)``, whose
    .5-boundary cells differ between the engines (Spark rounds the
    shortest decimal representation, DuckDB the binary value — one sf0.1
    cell flipped a 1-ulp divergence into the final rank).

    Scale (100 TB graph): each iteration is one shuffle of the edge list
    on ``src`` (join with the rank vector) and one on ``dst`` (the
    inbound sum); the rank vector is 2 columns/node.  Out-weights are
    precomputed once and persisted with the edges.  Hub-heavy graphs
    skew the ``dst`` aggregation, which partial aggregation absorbs
    (decimal sums combine map-side).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    ncnt = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))

    out_w = edges.groupBy(src).agg(F.sum(weight).alias("out_w"))
    e = edges.join(out_w, src).persist(StorageLevel.MEMORY_AND_DISK)

    pr = nodes.crossJoin(F.broadcast(ncnt)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    p12 = F.lit(1e12)

    def _r12(col):
        return F.floor(col * p12 + F.lit(0.5)) / p12

    for _ in range(iters):
        contrib = e.join(pr, e[src] == pr["node"]).select(
            F.col(dst).alias("node"),
            _r12(F.col("pr") * F.col(weight) / F.col("out_w"))
            .cast("decimal(28,12)")
            .alias("contrib"),
        )
        inbound = contrib.groupBy("node").agg(F.sum("contrib").alias("s"))
        pr = (
            nodes.join(inbound, "node", "left")
            .crossJoin(F.broadcast(ncnt))
            .select(
                "node",
                _r12(
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    # the node and weighted-edge persists are referenced by every
    # iteration of the returned plan — lease them to its lifetime
    return scope_caches(pr, nodes, e)
