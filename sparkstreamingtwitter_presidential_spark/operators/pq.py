"""Product quantization (PQ) for embedding similarity at memory scale.

The fourth leg of the ANN stack (see operators/similarity.py for
brute-force / sign-LSH / IVF): PQ attacks the MEMORY wall, not just
the compute wall. A 64-dim float32 vector is 256 bytes; its PQ code
(M=8 subspaces x 16 centroids) is 8 bytes — 32x compression — so a
corpus whose raw embeddings need a cluster's worth of RAM scans from a
fraction of it, which is how billion-vector indexes (FAISS IVF-PQ)
actually fit on machines.

Pipeline:

  pq_train      Lloyd's k-means per subspace on a bounded driver-side
                SAMPLE (codebooks are model state, like the KMeans
                centroids in ml/clustering.py — tiny and learned from a
                sample regardless of corpus scale). Deterministic:
                seeded numpy, fixed iterations.
  pq_encode     one Arrow-batched mapInPandas pass: argmin centroid per
                subspace, emits array<short> codes. Map-only, no
                shuffle; at 100 TB the encoded table (ids + 8-byte
                codes) is the persisted artifact.
  pq_topk       ADC (asymmetric distance computation) scan: per query,
                a (M x K) lookup table of subspace distances to the RAW
                query vector; each code's approximate distance is M
                table lookups summed — numpy fancy-indexing per Arrow
                batch, partial top-C per batch + global merge (the same
                no-hot-task shape as brute_force_topk), then an EXACT
                cosine re-rank of the C*k survivors against the raw
                vectors. Asymmetric (query stays unquantized) keeps the
                error one-sided; the re-rank restores exact ordering
                among survivors, so recall loss comes only from true
                neighbors missing the candidate pool.

Verification: no SQL twin (iterative training), so correctness is
pinned by pytest — planted near-duplicates must be recovered (recall
contract), codes must round-trip the expected compression, and the
ADC ranking must agree with exact cosine on the re-ranked set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

M_SUBSPACES = 8
K_CENTROIDS = 16
TRAIN_ITERS = 12
SEED = 7


def _lloyd(x: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Plain Lloyd's k-means (deterministic under the supplied rng).
    Empty clusters re-seed from the farthest points, so k centroids
    always survive."""
    n = x.shape[0]
    centroids = x[rng.choice(n, size=min(k, n), replace=False)].copy()
    if centroids.shape[0] < k:  # degenerate tiny input: pad by repeat
        reps = k - centroids.shape[0]
        centroids = np.vstack([centroids, centroids[rng.integers(0, centroids.shape[0], reps)]])
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                centroids[j] = x[mask].mean(axis=0)
            else:
                centroids[j] = x[d.min(axis=1).argmax()]
    return centroids


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = M_SUBSPACES,
    k: int = K_CENTROIDS,
    max_train: int = 10_000,
    seed: int = SEED,
) -> np.ndarray:
    """Train per-subspace codebooks on a bounded sample; returns an
    (m, k, dim/m) float64 array. Vectors are L2-normalized first (the
    search metric is cosine; on the unit sphere L2 ordering == cosine
    ordering). Sampling never counts the corpus (the r4-verdict extra
    pass): a CollectLimit probe for ``max_train + 1`` rows short-
    circuits after a few partitions — if the whole corpus fits the
    training budget (the common case for model fitting) that IS the
    sample; only a genuinely larger corpus pays the one distributed
    hash-ordered-limit pass (TakeOrderedAndProject: per-partition
    partial top-k, executor-side merge, driver receives exactly
    ``max_train`` rows). Either path is partitioning-independent: rows
    are (re)ordered by the deterministic id-hash before training, so
    the same corpus always trains the same codebooks."""
    from sparkstreamingtwitter_presidential_spark.operators.sampling import (
        HASH_MOD,
        HASH_MULT,
        sample_hash,
    )

    base = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    probe = base.limit(max_train + 1).collect()
    if len(probe) <= max_train:
        rows = sorted(
            probe, key=lambda r: ((r["_id"] * HASH_MULT) % HASH_MOD, r["_id"])
        )
    else:
        rows = (
            base.withColumn("_h", sample_hash(F.col("_id")))
            .orderBy(F.col("_h").asc(), F.col("_id").asc())
            .limit(max_train)
            .collect()
        )
    x = np.array([r["_v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1.0, norms)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    return np.stack(
        [_lloyd(x[:, i * sub : (i + 1) * sub], k, TRAIN_ITERS, rng) for i in range(m)]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, code array<short> of length m, *carry): nearest centroid per
    subspace of the L2-NORMALIZED vector. One Arrow-batched map pass.
    ``carry`` columns pass through untouched in the same batch (e.g. an
    IVF cell id), so composing quantizers costs no join."""
    m, _k, sub = codebooks.shape
    books = codebooks  # captured by value into the closure
    carry = list(carry or [])

    in_fields = {f.name: f for f in corpus.schema.fields}
    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("code", ArrayType(ShortType())),
        ]
        + [in_fields[c] for c in carry]
    )

    def encode(batches):
        for pdf in batches:
            import pandas as pd

            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if x.size == 0:
                continue
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.where(norms == 0, 1.0, norms)
            codes = np.empty((x.shape[0], m), dtype=np.int16)
            for i in range(m):
                chunk = x[:, i * sub : (i + 1) * sub]
                d = ((chunk[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d.argmin(axis=1).astype(np.int16)
            out = {"vec_id": pdf[id_col].values, "code": list(codes)}
            for c in carry:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    return corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col), *carry
    ).mapInPandas(encode, out_schema)


def pq_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = M_SUBSPACES,
    n_centroids: int = K_CENTROIDS,
    rerank_factor: int = 8,
    max_train: int = 10_000,
    seed: int = SEED,
) -> DataFrame:
    """Approximate cosine top-k via PQ/ADC with exact re-rank.

    Scan cost per batch: one (rows x m) int16 gather + row-sum over the
    8-byte codes instead of a (rows x dim) float dot — and at real
    scale the encoded table is what sits in memory. Candidates
    (rerank_factor*k per query per batch, merged globally) re-rank
    exactly against raw vectors, so returned scores are TRUE cosines.
    Returns (query_id, vec_id, cos_sim, rank)."""
    codebooks = pq_train(corpus, id_col, vec_col, m, n_centroids, max_train, seed)
    sub = codebooks.shape[2]
    encoded = pq_encode(corpus, codebooks, id_col, vec_col)

    qrows = (
        corpus.filter(F.col(id_col).isin(query_ids))
        .filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qmat = qmat / np.where(qnorm == 0, 1.0, qnorm)
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    # ADC tables: for query q, subspace i, centroid c -> squared L2
    # distance between the RAW query chunk and the centroid.
    tables = np.empty((qids.size, m, codebooks.shape[1]), dtype=np.float64)
    for i in range(m):
        qc = qmat[:, i * sub : (i + 1) * sub]
        tables[:, i, :] = ((qc[:, None, :] - codebooks[i][None, :, :]) ** 2).sum(axis=2)

    n_cand = max(k * rerank_factor, k)
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("adc_dist", DoubleType()),
        ]
    )

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(list(pdf["code"]), dtype=np.int64)  # rows x m
            ids = pdf["vec_id"].values
            for qi in range(qids.size):
                # gather: rows x m lookups into this query's table
                d = tables[qi][np.arange(m)[None, :], codes].sum(axis=1)
                keep = min(n_cand, d.size)
                idx = np.argpartition(d, keep - 1)[:keep]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(keep, qids[qi], dtype=np.int64),
                        "vec_id": ids[idx],
                        "adc_dist": d[idx],
                    }
                )

    candidates = (
        encoded.mapInPandas(scan, out_schema)
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _merge_and_rerank(
        candidates, corpus, qids, qmat, n_cand, k, id_col, vec_col
    )


def _merge_and_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    qids: np.ndarray,
    qmat: np.ndarray,
    n_cand: int,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ADC-candidate tail for pq_topk / ivfpq_topk: global merge
    of the per-batch partial top-C (smallest ADC distances per query),
    then an exact cosine re-rank of the survivors against raw vectors —
    returned scores are TRUE cosines."""
    from pyspark.sql import Window

    from sparkstreamingtwitter_presidential_spark.operators.dedup import (
        dot_product,
        vec_norm,
    )

    merged = (
        candidates.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("adc_dist").asc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("r") <= n_cand)
        .drop("r", "adc_dist")
    )
    raw = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(int(q), [float(x) for x in qmat[i]]) for i, q in enumerate(qids)],
        "query_id long, qv array<double>",
    )
    sim = dot_product(F.col("qv"), F.col("cv")) / (
        F.lit(1.0) * vec_norm(F.col("cv"))
    )  # qv is pre-normalized; |qv| == 1
    scored = (
        merged.join(raw, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            (F.floor(sim * 10000.0 + F.lit(0.5)) / 10000.0).alias("cos_sim"),
        )
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos_sim").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = M_SUBSPACES,
    n_centroids: int = K_CENTROIDS,
    n_cells: int = 16,
    n_probe: int = 4,
    rerank_factor: int = 8,
    max_train: int = 10_000,
    seed: int = SEED,
) -> DataFrame:
    """IVF-PQ: PQ codes routed through an IVF coarse quantizer — the
    billion-vector FAISS composition. The coarse quantizer
    (similarity.ivf_index, spherical k-means) prunes WHICH codes are
    scanned; PQ compresses WHAT is scanned — so the ADC pass touches
    only the probed cells' 8-byte codes instead of every vector.

    Plan shape: the encoded table carries its cell id (pq_encode
    ``carry`` — no join), the probe-set filter ``cell IN (...)`` is a
    pushed-down literal predicate (on a cell-bucketed/partitioned table
    at 100 TB this is partition pruning, not a scan-and-drop), the ADC
    scan masks per-query probe cells inside each Arrow batch, and the
    candidate tail (partial top-C per batch -> global merge -> exact
    cosine re-rank) is shared with pq_topk. Recall loss compounds the
    two approximations (cell miss + code quantization); the exact
    re-rank keeps returned scores true cosines, and tests pin the
    composed floor at the flat-PQ floor on the fixture."""
    from sparkstreamingtwitter_presidential_spark.operators.similarity import (
        ivf_index,
    )

    centroids, assigned = ivf_index(corpus, id_col, vec_col, n_cells, seed)
    assigned = assigned.persist()
    assigned.count()  # materialize BEFORE fan-out (same rationale as
    #                   ivf_topk: racing branches recompute an unfilled
    #                   cache under AQE)
    codebooks = pq_train(corpus, id_col, vec_col, m, n_centroids, max_train, seed)
    sub = codebooks.shape[2]

    qrows = (
        assigned.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "cv")
        .collect()
    )
    qmat = np.array([r["cv"] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qmat = qmat / np.where(qnorm == 0, 1.0, qnorm)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)

    # query-side probe sets: n_probe euclidean-nearest centroids of the
    # NORMALIZED query (the quantizer's own assignment metric)
    cents = np.array(centroids, dtype=np.float64)
    d2 = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1)[:, :n_probe]
    all_cells = sorted({int(c) for row in probes for c in row})

    tables = np.empty((qids.size, m, codebooks.shape[1]), dtype=np.float64)
    for i in range(m):
        qc = qmat[:, i * sub : (i + 1) * sub]
        tables[:, i, :] = ((qc[:, None, :] - codebooks[i][None, :, :]) ** 2).sum(axis=2)

    n_cand = max(k * rerank_factor, k)
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("adc_dist", DoubleType()),
        ]
    )
    probe_sets = [np.array(p, dtype=np.int64) for p in probes]

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(list(pdf["code"]), dtype=np.int64)
            cells = pdf["cell"].values.astype(np.int64)
            ids = pdf["vec_id"].values
            for qi in range(qids.size):
                mask = np.isin(cells, probe_sets[qi])
                if not mask.any():
                    continue
                d = tables[qi][np.arange(m)[None, :], codes[mask]].sum(axis=1)
                keep = min(n_cand, d.size)
                idx = np.argpartition(d, keep - 1)[:keep]
                mids = ids[mask]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(keep, qids[qi], dtype=np.int64),
                        "vec_id": mids[idx],
                        "adc_dist": d[idx],
                    }
                )

    # The cell prune happens BEFORE encoding (a filter cannot push
    # through the opaque Python map): only probed cells' vectors are
    # encoded and ADC-scanned. In a persisted deployment the encoded
    # (vec_id, code, cell) table is the stored artifact, bucketed by
    # cell, and this same literal IN-filter prunes its scan instead.
    encoded = pq_encode(
        assigned.filter(F.col("cell").isin(all_cells)),
        codebooks,
        "vec_id",
        "cv",
        carry=["cell"],
    )
    candidates = (
        encoded.mapInPandas(scan, out_schema)
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _merge_and_rerank(
        candidates, corpus, qids, qmat, n_cand, k, id_col, vec_col
    )
