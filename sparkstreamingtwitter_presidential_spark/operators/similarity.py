"""Similarity search over embedding columns (array<float>).

Three paths:

  brute_force_topk   exact cosine top-k: broadcast the (small) query set,
                     scan the corpus once, rank per query. The baseline
                     and the verifier for approximate paths.
  lsh_topk           random-hyperplane LSH: N_PLANES-bit (8-bit, 256
                     buckets) sign signature -> bucket equi-join ->
                     exact cosine re-rank of the candidates, with
                     MULTI-PROBE: each query also probes its bucket's
                     Hamming-ball neighborhood (radius 1 default, 2 for
                     the near-dup recall contract), the standard recall
                     fix for a near-boundary query whose true neighbors
                     landed a sign flip away. The 100 TB path — the
                     corpus shuffles on the bucket key only; the probe
                     fan-out multiplies the tiny query side, never the
                     corpus. Effective when "similar" means near-dup
                     (cosine >= ~0.9); for weak similarity on
                     unclustered data, sign-LSH cannot beat brute force
                     (see probe_buckets docstring).
  ivf_topk           IVF (inverted-file) ANN: a KMeans coarse quantizer
                     partitions the corpus into cells; each query probes
                     its n_probe nearest cells and exact-reranks only
                     those candidates. The alternative 100 TB path —
                     data-ADAPTIVE cells (centroids learned from the
                     corpus) where LSH's hyperplanes are data-blind, so
                     it keeps recall on clustered corpora at much
                     smaller candidate sets. See ivf_index/ivf_topk.

All expressions are builtin higher-order array ops (zip_with/aggregate)
accumulated in double, bit-identical to DuckDB's list_cosine_similarity
on DOUBLE[] (verified empirically on the fixtures).

Scale notes: brute-force scoring is a broadcast nested loop — fine for
O(10) queries. Its ranking is a PARTIAL top-k (Arrow-batched per-batch
head-k via mapInPandas) followed by a global per-query merge window, so
only ~k rows per query survive each scan batch and the shuffle into the
merge is O(k x partitions x queries), never O(|corpus| x queries) — a
single hot per-query task over all scored rows would be the 100x scale
killer. LSH/IVF rankings keep a plain window: their candidate sets are
already bucket-pruned small. Hyperplanes are deterministic module
constants (seed 7), so signatures are reproducible across runs and
engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators.dedup import dot_product, vec_norm

N_PLANES = 8  # 256 buckets: ~n/256 candidates per probe; enough recall on
#              the fixture corpora while still cutting the scan 256x.
EMBED_DIM = 64

_rng = random.Random(7)
#: Random hyperplanes in R^64 (gaussian, fixed seed). Module-level so
#: Spark and the generated DuckDB oracle share the exact float values.
HYPERPLANES: list[list[float]] = [
    [_rng.gauss(0.0, 1.0) for _ in range(EMBED_DIM)] for _ in range(N_PLANES)
]


def _dot_with_constants(vec: Column, plane: list[float]) -> Column:
    # One array<double> literal, NOT F.array(*[F.lit(x) ...]): the
    # per-element form costs |plane| py4j round-trips and |plane|
    # Catalyst nodes PER CALL SITE — with 16 centroids x 64 dims that
    # was ~1k round-trips per probe_cells() and a plan Catalyst spends
    # seconds analyzing (r15 measurement: ivf_search/ivf_assign plan
    # BUILD alone ~2.7 s warm). A single Literal carries the same
    # values; zip_with evaluates identically element-by-element.
    arr = F.lit([float(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec, arr, lambda v, p: v.cast("double") * p),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(vec: Column) -> Column:
    """N_PLANES-bit random-hyperplane signature: bit j = sign(<v, r_j>)."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(HYPERPLANES):
        out = out + F.when(
            _dot_with_constants(vec, plane) >= 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def _partial_then_merge_topk(scored: DataFrame, k: int) -> DataFrame:
    """Distributed top-k per query over a (query_id, vec_id, cos_sim)
    DataFrame: per-Arrow-batch head-k (same ordering as the final rank,
    so any global top-k row survives its own batch — the standard
    partial-top-k argument), then a global merge window over the tiny
    survivor set. The merge input is bounded by k x batches x queries
    regardless of corpus size."""
    import pandas as pd  # noqa: F401 — Arrow batch type

    def head_k(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["cos_sim", "vec_id"], ascending=[False, True]
                    )
                    .groupby("query_id", sort=False)
                    .head(k)
                )

    partial = scored.mapInPandas(head_k, schema=scored.schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def brute_force_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (self excluded).

    The query set is broadcast (it is tiny by construction); the corpus
    is scanned exactly once and ranked via partial top-k + merge (see
    _partial_then_merge_topk). Returns (query_id, vec_id, cos_sim, rank).
    """
    base = corpus.filter(F.col(vec_col).isNotNull())
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qnrm", vec_norm(F.col("qv")))
    c = base.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).withColumn("cnrm", vec_norm(F.col("cv")))
    sim = dot_product(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.floor(sim * 10000.0 + F.lit(0.5)) / 10000.0).alias("cos_sim"),
        )
    )
    return _partial_then_merge_topk(scored, k)


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
) -> tuple[list[list[float]], DataFrame]:
    """Fit an IVF coarse quantizer and assign every corpus vector to its
    cell. Returns (centroids, assigned) where ``assigned`` has columns
    (vec_id, cv, cnrm, cell).

    Vectors are L2-normalized before the KMeans fit (spherical k-means):
    on the unit sphere, euclidean argmin == cosine argmax, so cell
    assignment partitions by the similarity the search uses. The fit is
    iterative (n_cells x maxIter distributed passes over the cached
    features — the one legitimately driver-coordinated loop, same as the
    reference's MLlib workflow); assignment is a single map-side
    transform. At 100 TB you fit on a sample, persist (centroids,
    assigned) like lsh_signature_table, and optionally bucket the
    assigned table BY cell so a probe is a partition-pruned scan, not a
    shuffle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
        .withColumn("cnrm", vec_norm(F.col("cv")))
        .filter(F.col("cnrm") > 0)
        .withColumn(
            "nv", F.transform(F.col("cv"), lambda x: x.cast("double") / F.col("cnrm"))
        )
        .withColumn("features", array_to_vector(F.col("nv")))
    )
    # Persist the features frame across the fit's iterations AND the
    # subsequent transform: MLlib's internal instance cache does not
    # cover re-evaluating this plan (parquet scan + norm/normalize HOFs
    # + array_to_vector), and measured fit time drops ~2.4x with the
    # explicit persist (r15; partitioning unchanged, so the fit's
    # aggregation order and the centroids are bit-identical). Blocks
    # are released by the ContextCleaner once the returned frame's
    # lineage is collected — same lifecycle as ivf_search's persist.
    base = base.persist()
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(base)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    assigned = model.transform(base).select("vec_id", "cv", "cnrm", "cell")
    return centroids, assigned


def probe_cells(
    nv: Column, centroids: list[list[float]], n_probe: int
) -> Column:
    """The ``n_probe`` cells nearest (euclidean, matching the quantizer's
    assignment metric) to a NORMALIZED query vector, as an array of cell
    ids. Ranking uses argmin ||q - c||^2 == argmax (q.c - |c|^2/2) with
    |q| constant, so only one dot product per centroid is evaluated —
    and only on the tiny query side; the corpus is never rescored."""
    # One literal per centroid plus one literal bias vector, folded by a
    # single transform-with-index — NOT one hand-built struct tree per
    # centroid (16x the Catalyst nodes and py4j calls for identical
    # values; see _dot_with_constants). Scores and the struct sort
    # order are bit-identical to the unrolled form: same zip_with
    # arithmetic per centroid, same (s desc, cell desc) struct compare.
    cents = F.array(*[F.lit([float(x) for x in c]) for c in centroids])
    biases = F.lit([0.5 * sum(x * x for x in c) for c in centroids])
    scored = F.transform(
        cents,
        lambda c, j: F.struct(
            (
                F.aggregate(
                    F.zip_with(nv, c, lambda v, p: v.cast("double") * p),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                - F.element_at(biases, j + 1)
            ).alias("s"),
            j.cast("int").alias("cell"),
        ),
    )
    top = F.slice(F.sort_array(scored, asc=False), 1, n_probe)
    return F.transform(top, lambda p: p.getField("cell"))


def ivf_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via an IVF index: KMeans cells + n_probe
    nearest-cell candidate generation + exact cosine re-rank.

    Recall comes from data adaptivity: clusters in the corpus become
    cells, so a query's true neighbors concentrate in its few nearest
    cells (tests pin recall >= 0.9 vs brute force on planted near-dup
    fixtures at n_probe=4, n_cells=16). Like all cell-probe methods it
    cannot help on uniformly random corpora (neighbors at cosine ~0.3
    spread over all cells) — brute_force_topk is the honest path there.
    Returns (query_id, vec_id, cos_sim, rank).
    """
    centroids, assigned = ivf_index(corpus, id_col, vec_col, n_cells, seed)
    return ivf_search(centroids, assigned, query_ids, k, n_probe)


def ivf_search(
    centroids: list[list[float]],
    assigned: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe an EXISTING IVF index: ``assigned`` is any
    (vec_id, cv, cnrm, cell) table — the freshly-fit one (ivf_topk), a
    persisted index artifact, or a base-index UNION an incrementally
    assigned delta (ivf_assign). Searching never needs the fit."""
    assigned = assigned.persist()
    assigned.count()  # materialize BEFORE fan-out: the query-side filter
    #                   and the cell join race under AQE, and an unfilled
    #                   cache is recomputed by every racing branch (same
    #                   fix as dedup.jaccard_pairs; blocks are released by
    #                   the ContextCleaner once the result's lineage is
    #                   collected — same lifecycle as every persist here)
    q = (
        assigned.filter(F.col("vec_id").isin(query_ids))
        .withColumn(
            "nv", F.transform(F.col("cv"), lambda x: x.cast("double") / F.col("cnrm"))
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cv").alias("qv"),
            F.col("cnrm").alias("qnrm"),
            F.explode(probe_cells(F.col("nv"), centroids, n_probe)).alias("qcell"),
        )
    )
    sim = dot_product(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))
    scored = (
        assigned.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.floor(sim * 10000.0 + F.lit(0.5)) / 10000.0).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    new_vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental index maintenance: assign a NEW batch of vectors to
    the nearest existing centroid — map-only (zero shuffles, no refit,
    cost proportional to |new batch|). Output schema matches
    ivf_index's assigned table, so maintenance is
    ``index.unionByName(ivf_assign(batch, centroids))`` and search is
    unchanged (ivf_search). Assignment uses the same
    argmin ||q - c||^2 == argmax (q.c - |c|^2/2) ranking as the
    quantizer, so an appended vector lands in the cell the fit would
    have put it in.

    The drift contract at 100 TB: appended batches shift the data
    distribution the centroids no longer summarize; monitor
    cell_counts and refit when the balance degrades (recall decays
    gracefully via n_probe in the meantime). Tests pin
    assignment-equality with the fitted quantizer and delta-recall.
    """
    base = (
        new_vectors.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
        .withColumn("cnrm", vec_norm(F.col("cv")))
        .filter(F.col("cnrm") > 0)
        .withColumn(
            "nv", F.transform(F.col("cv"), lambda x: x.cast("double") / F.col("cnrm"))
        )
    )
    return base.withColumn(
        "cell", F.element_at(probe_cells(F.col("nv"), centroids, 1), 1)
    ).select("vec_id", "cv", "cnrm", "cell")


def cell_counts(assigned: DataFrame) -> DataFrame:
    """(cell, n) occupancy of an IVF index — the drift/imbalance signal
    an incremental deployment watches to schedule refits (one tiny
    aggregate; n_cells rows)."""
    return assigned.groupBy("cell").agg(F.count("*").alias("n"))


def probe_buckets(bucket: Column, radius: int = 1) -> Column:
    """Multi-probe set for a signature bucket: every bucket within
    Hamming distance ``radius`` of it (radius 0 -> 1 bucket, 1 -> 9,
    2 -> 37 for N_PLANES=8). A query vector near a hyperplane boundary
    has true neighbors a few sign flips away; probing those buckets
    recovers them at a multiplied CANDIDATE cost — the corpus is never
    re-hashed or re-shuffled, only the tiny query side fans out.

    Recall math (what radius buys, for a neighbor at angle theta, each
    bit independently agrees w.p. 1 - theta/pi): in the NEAR-DUP regime
    (cosine >= 0.95, theta <= 18deg, bit-agree ~ 0.9) radius 2 catches
    ~96-98%% of true neighbors. For weakly-similar "neighbors" (cosine
    ~ 0.3 — e.g. the nearest points of an UNclustered random corpus,
    bit-agree ~ 0.6) no affordable radius helps: sign-LSH is the wrong
    tool there and brute_force_topk is the honest path. This is the
    documented, fundamental LSH trade, not an implementation limit."""
    probes = [bucket]
    if radius >= 1:
        probes += [
            bucket.bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(N_PLANES)
        ]
    if radius >= 2:
        probes += [
            bucket.bitwiseXOR(F.lit((1 << i) | (1 << j)).cast("long"))
            for i in range(N_PLANES)
            for j in range(i + 1, N_PLANES)
        ]
    if radius >= 3:
        raise ValueError("probe radius > 2 would scan most of the corpus; use brute_force_topk")
    return F.array(*probes)


def lsh_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets with
    Hamming-ball multi-probe (see probe_buckets for the recall math).

    Candidates = corpus vectors whose N_PLANES-bit signature is within
    ``probe_radius`` bit flips of the query's; re-ranked by exact
    cosine. Each corpus vector matches a query through at most one probe
    value (probe values are distinct), so no candidate dedup is needed.
    Recall < 1 remains possible by construction (the documented LSH
    trade — tests pin recall >= 0.9 vs brute force on planted near-dup
    fixtures at radius 2); at scale add probes or signature tables.
    Returns (query_id, vec_id, cos_sim, rank).
    """
    base = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("cnrm"),
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("cv").alias("qv"),
        F.explode(probe_buckets(F.col("bucket"), probe_radius)).alias("qbucket"),
        F.col("cnrm").alias("qnrm"),
    )
    sim = dot_product(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))
    scored = (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.floor(sim * 10000.0 + F.lit(0.5)) / 10000.0).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
