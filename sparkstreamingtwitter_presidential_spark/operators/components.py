"""Connected components over a pair graph — the clustering step that
turns near-dup PAIRS (from Jaccard/MinHash/SimHash/embedding dedup)
into canonical document clusters: every member maps to the smallest id
reachable through the pair graph.

Implementation: iterative min-label propagation PLUS pointer jumping on
DataFrames. Each round (a) joins current labels across edges and keeps
the per-node min (one shuffle on the node id), then (b) replaces each
node's label with its label's own label (one more self-join shuffle) —
the classic pointer-doubling step, so convergence takes O(log diameter)
rounds instead of O(diameter). Plain propagation is fine for shallow
near-dup graphs but dies on chains: a 1,000-link chain (the
``dedup_components_chain`` query at sf0.1) needs 1,000 propagation-only
rounds vs ~11 with jumping — at 100 TB, graph diameter is exactly the
thing you cannot bound in advance.

Labels are localCheckpoint'ed (eager) each round, which TRUNCATES the
logical plan — persist alone is not enough here: the pointer-jump step
references the relaxed labels twice (a plan diamond), so without
truncation the analyzed plan DOUBLES every round and Catalyst OOMs the
driver after ~15 rounds on a 20-row input (observed: Java heap OOM in
analysis, zero data involved). On a real cluster with lost-executor
concerns, swap localCheckpoint for reliable `checkpoint()` against a
checkpoint dir — same plan-truncation property, plus fault tolerance.

This is SURVEY.md's "iterative algorithm" case — yet still oracle-able:
DuckDB computes the same fixpoint with a recursive CTE (transitive
closure of min labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id_a, id_b) undirected pairs -> (id, component) with component =
    min id reachable. Only nodes appearing in pairs are returned
    (singletons are trivially their own component).

    Raises RuntimeError if the fixpoint is not reached in ``max_iter``
    rounds — a silently-unconverged labeling is a wrong answer, not an
    approximation. With pointer jumping, max_iter=25 covers diameters
    up to ~2^25.
    """
    # Both edge directions from ONE evaluation of ``pairs``: the old
    # two-branch union re-ran the (potentially expensive) pair plan —
    # e.g. the blocked cosine self-join feeding semantic dedup — once
    # per branch inside the same materialization (r15 measurement:
    # half the edge-build cost at sf0.1). explode fans each pair into
    # its two directions in a single pass; the resulting edge SET is
    # identical.
    both = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("u"), F.col("id_b").alias("v")
                    ),
                    F.struct(
                        F.col("id_b").alias("u"), F.col("id_a").alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )
    n_directed = both.count()  # materialize once; also sizes the loop

    # Scale-adaptive loop parallelism (guide §2: derive partitioning
    # from input size, not from a constant tuned for one deployment).
    # The iteration frames are proportional to the NEAR-DUP EDGE SET,
    # which is orders of magnitude smaller than the corpus; running
    # every round at the session's corpus-sized shuffle width spends
    # more time scheduling empty tasks than propagating labels
    # (measured 2.4x the loop cost at sf0.1). ~4M directed edges
    # (~64 MB of (u,v) longs) per reduce partition, capped at the
    # session's configured width so a genuinely huge graph keeps full
    # parallelism.
    spark = pairs.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    aqe_key = "spark.sql.adaptive.enabled"
    old_parts = spark.conf.get(conf_key)
    old_aqe = spark.conf.get(aqe_key)
    loop_parts = max(1, min(int(old_parts), n_directed // 4_000_000 + 1))
    spark.conf.set(conf_key, str(loop_parts))
    if loop_parts == 1:
        # Single-partition loop shuffles leave AQE nothing to coalesce
        # or skew-split — it only re-plans each round's two joins stage
        # by stage, pure per-round driver latency over O(log d) rounds
        # (measured ~1 s/call at sf0.1). A graph big enough for
        # loop_parts > 1 keeps AQE: its skew-join handling is exactly
        # what a hot-label neighbor join needs (guide §2.5).
        spark.conf.set(aqe_key, "false")
    try:
        return _cc_loop(both, max_iter)
    finally:
        spark.conf.set(conf_key, old_parts)
        spark.conf.set(aqe_key, old_aqe)
        both.unpersist()


def _cc_loop(both: DataFrame, max_iter: int) -> DataFrame:
    """Pointer-jumping core of connected_components, run under the
    loop-scoped shuffle width its caller established."""
    edges = both.distinct().persist()
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    # Convergence detector: labels are per-node min-monotone (each round
    # can only lower them), so the fixpoint is reached exactly when the
    # GLOBAL label sum stops changing — one cheap aggregate per round on
    # the already-checkpointed labels, replacing the old-vs-new join
    # that used to cost a full extra shuffle each round.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    converged = False
    for _ in range(max_iter):
        # (a) neighbor relaxation: min label over incident edges
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        relaxed = labels.join(neighbor_min, labels.id == neighbor_min.u, "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
        )
        # (b) pointer jump: component <- component's component. Every
        # label is itself a node id (it is a min over ids), so the
        # self-join is total; the left join only guards the fixpoint
        # rows where component == id.
        ptr = relaxed.select(
            F.col("id").alias("cid"), F.col("component").alias("ccomp")
        )
        new_labels = (
            relaxed.join(ptr, relaxed.component == ptr.cid, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("ccomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate the plan BEFORE comparing
        )
        new_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels.unpersist()  # checkpoint blocks of the superseded round
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels


def merge_components(labels: DataFrame, new_pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Incrementally fold ``new_pairs`` into an existing labeling:
    returns (id, component) equal to a FULL recompute over
    old_graph + new_pairs — without touching the old graph's edges.

    How: each existing component collapses to one super-node (its label
    — valid because labels are min-reachable ids, so the label of a
    merged group of components is the min of their labels, and new
    nodes contribute their own ids). New pairs are mapped through the
    labeling to representatives, self-loops (pairs internal to one old
    component) drop out, and the pointer-jumping core runs on the
    REDUCED graph only — cost ∝ components touched by new edges + new
    nodes, not |old graph|. Untouched components pass through by a
    left-join coalesce, unshuffled beyond the one relabel join.

    At 100 TB this is the companion to incremental_lsh_pairs
    (operators/dedup.py): the persisted labeling is corpus state, each
    ingest batch contributes its LSH pairs, and clustering cost tracks
    the batch, never the corpus.
    """
    la = labels.select(F.col("id").alias("id_a"), F.col("component").alias("rep_a"))
    lb = labels.select(F.col("id").alias("id_b"), F.col("component").alias("rep_b"))
    reduced_edges = (
        new_pairs.select("id_a", "id_b")
        .join(la, "id_a", "left")
        .join(lb, "id_b", "left")
        .select(
            F.coalesce("rep_a", "id_a").alias("id_a"),
            F.coalesce("rep_b", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    reduced = connected_components(reduced_edges, max_iter)
    red = reduced.select(F.col("id").alias("rep"), F.col("component").alias("newc"))
    relabeled_old = (
        labels.join(F.broadcast(red), labels.component == red.rep, "left")
        .select("id", F.coalesce("newc", "component").alias("component"))
    )
    # Nodes introduced by the new pairs (their representative is their
    # own id, so they appear in the reduced labeling directly).
    new_nodes = reduced.join(labels.select("id"), "id", "left_anti").select(
        "id", "component"
    )
    return relabeled_old.unionByName(new_nodes)


def canonical_members(
    corpus: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Survivor selection — the step after clustering in a dedup
    pipeline: every corpus row gets its near-dup ``component``, the
    cluster's ``canonical_id`` (highest ``quality_col``, ties to the
    smallest id), and ``is_canonical`` (keep this row, drop the rest).

    Scale shape: ``labels`` covers only docs that HAVE near-dups (a
    tiny fraction of the corpus), so it broadcasts; docs outside any
    cluster are trivially their own canonical and pass through the
    anti-join MAP-ONLY — the per-component window shuffles just the
    clustered slice, never the corpus. Returns
    (id, component, canonical_id, is_canonical)."""
    from pyspark.sql import Window

    lab = labels.select(
        F.col("id").alias(id_col), F.col("component").alias("component")
    )
    slim = corpus.select(id_col, quality_col)
    clustered = slim.join(F.broadcast(lab), id_col)
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    ranked = clustered.withColumn(
        "canonical_id", F.first(F.col(id_col)).over(w)
    ).select(
        id_col,
        "component",
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )
    singles = slim.join(F.broadcast(lab), id_col, "left_anti").select(
        F.col(id_col),
        F.col(id_col).alias("component"),
        F.col(id_col).alias("canonical_id"),
        F.lit(True).alias("is_canonical"),
    )
    return ranked.unionByName(singles)
