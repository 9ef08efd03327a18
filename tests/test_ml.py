"""Operator-level tests for clustering / PageRank / containment kernels
(tamar_spark.operators.clustering, dedup.containment_pairs).

The full-query oracle gate lives in test_oracle.py; these pin the kernel
semantics on crafted inputs where the expected answer is known by
construction.
"""

import pytest
from pyspark.sql import functions as F

from tamar_spark.operators import clustering as C
from tamar_spark.operators import dedup as D


def test_kmeans_separates_well_separated_groups(spark):
    # two tight groups far apart: k=2 must split them exactly, whatever
    # the init, because iteration 1 already assigns by nearest init vector
    # (id 0 from group A, id 1... ids interleave groups to exercise the
    # deterministic smallest-id init across both)
    rows = []
    for i in range(10):
        base = 0.0 if i % 2 == 0 else 100.0
        rows.append((i, [base + 0.01 * i, base - 0.01 * i, base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = C.kmeans(df, k=2, iters=2).collect()
    assert len(out) == 10
    by_group = {0: set(), 1: set()}
    for r in out:
        by_group[r["vec_id"] % 2].add(r["cluster"])
    # each parity class (= spatial group) lands in exactly one cluster,
    # and the two clusters differ
    assert len(by_group[0]) == 1 and len(by_group[1]) == 1
    assert by_group[0] != by_group[1]
    assert all(r["dist"] >= 0 for r in out)


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    from tamar_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, C.kmeans(emb, k=8, iters=2).collect()))
    b = sorted(map(tuple, C.kmeans(emb, k=8, iters=2).collect()))
    assert a == b
    assert {r[0] for r in a} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    out = {r["node"]: r["pr"] for r in C.pagerank(edges, iters=5).collect()}
    # a symmetric cycle's stationary distribution is uniform and 1/3 is
    # a fixed point of the damped update, so every iterate stays there
    assert out.keys() == {"a", "b", "c"}
    for v in out.values():
        assert v == pytest.approx(1 / 3, abs=1e-9)


def test_pagerank_hub_ranks_highest_and_mass_bounded(spark):
    # star: every spoke points at the hub; hub points at one spoke
    spokes = [f"s{i}" for i in range(5)]
    rows = [(s, "hub", 1) for s in spokes] + [("hub", "s0", 1)]
    edges = spark.createDataFrame(rows, "src string, dst string, w long")
    out = {r["node"]: r["pr"] for r in C.pagerank(edges, iters=3).collect()}
    assert max(out, key=out.get) == "hub"
    # no dangling nodes here, so total mass stays 1 (up to rounding)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-6)


def test_containment_catches_subset_that_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different words here ok")],
        "doc_id long, text string",
    )
    cont = D.containment_pairs(df, threshold=0.9).collect()
    assert [(r["doc_id_1"], r["doc_id_2"]) for r in cont] == [(1, 2)]
    assert cont[0]["containment"] == 1.0
    jac = D.jaccard_pairs(df, threshold=0.9).collect()
    assert jac == []  # symmetric Jaccard scores the pair at ~len ratio


def test_containment_cap_matches_uncapped(spark, sf_dir):
    from tamar_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    capped = sorted(
        map(tuple, D.containment_pairs(docs, 0.8, max_doc_freq=32).collect())
    )
    uncapped = sorted(map(tuple, D.containment_pairs(docs, 0.8).collect()))
    assert capped == uncapped
    assert len(capped) > 0  # fixture dup groups must surface
