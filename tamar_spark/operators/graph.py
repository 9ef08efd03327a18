"""Connected components — duplicate-cluster resolution for dedup pipelines.

Near-dup detection (`operators.dedup`) emits PAIRS; deduplication needs
CLUSTERS (every document mapped to one canonical representative, even when
A~B and B~C but A!~C). That closure step is connected components.

Implementation: iterative min-label propagation as pure DataFrame ops —
each node starts labeled with itself; every round each node takes the
minimum label among itself and its neighbors; converged when no label
changes. The driver only orchestrates rounds (checks one count per round);
all data stays distributed. Rounds needed = graph diameter, which for
near-dup clusters is tiny (dup groups are near-cliques, typically 1-3
rounds). For web-scale graphs with long chains, swap the body for the
large-star/small-star algorithm (Kiveris et al.) — same interface.

The per-round plan: one shuffle to aggregate min neighbor label, one
broadcast-or-shuffle join back to labels. Labels are (node, long) pairs —
the working set is |V|, never |V|×|E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iter: int = 20,
) -> DataFrame:
    """Map every node in ``pairs`` to its component's minimum node id.

    Returns ``(node, component)``. Deterministic: the representative is the
    smallest id in the component.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.persist()
    labels.count()

    for _ in range(max_iter):
        # min label among each node's neighbors
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "component")
