"""Connected components over a pair graph — the clustering step that
turns near-dup PAIRS (from Jaccard/MinHash/SimHash/embedding dedup)
into canonical document clusters: every member maps to the smallest id
reachable through the pair graph.

Implementation: iterative min-label propagation on DataFrames. Each
round joins current labels across edges and keeps the per-node min;
convergence when no label changes. Rounds needed = graph diameter
(near-dup clusters are shallow — pairs chain through shared shingles),
and every round is one shuffle on the node id. Labels persist per
round and unpersist after the next materializes, so lineage stays
bounded (no runaway DAG across iterations — the classic iterative-
Spark trap).

This is SURVEY.md's "iterative algorithm" case — yet still oracle-able:
DuckDB computes the same fixpoint with a recursive CTE (transitive
closure of min labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(id_a, id_b) undirected pairs -> (id, component) with component =
    min id reachable. Only nodes appearing in pairs are returned
    (singletons are trivially their own component)."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("u").alias("id")).distinct().withColumn(
        "component", F.col("id")
    ).persist()
    labels.count()  # materialize

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels
