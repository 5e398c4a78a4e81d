r"""Dedup queries over the documents/embeddings tables.

Oracles: exact dedup, brute-force n-gram Jaccard pairs, and embedding
near-dup pairs are fully SQL-expressible in DuckDB (same shingling /
cosine, proven value-identical). MinHash-LSH is verified against the
SAME brute-force Jaccard SQL — its exact-verification step makes output
equal to the brute-force result whenever banding recall catches every
pair >= threshold (r=2, b=16 -> miss probability ~1e-5 at j=0.5 for a
single pair; deterministic fixtures make the check stable). SimHash has
no DuckDB twin (xxhash64) -> rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators import dedup as D
from sparkstreamingtwitter_presidential_spark.queries.registry import query

JACCARD_THRESHOLD = 0.5

# Shared DuckDB shingle CTE: distinct word-3-gram shingles per doc
# (twin of operators.dedup.word_shingles with n=3).
_DUCK_SHINGLES = r"""
  WITH toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents WHERE text IS NOT NULL
  ),
  d AS (
    SELECT doc_id,
           list_distinct(
             CASE WHEN len(t) >= 3 THEN
               list_transform(generate_series(1, len(t) - 2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END) AS sh
    FROM toks
  ),
  inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
  sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
  pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
    FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  )
"""

_DUCK_JACCARD_PAIRS = (
    _DUCK_SHINGLES
    + r"""
  SELECT id_a, id_b,
         floor((common::DOUBLE / (sa.n_sh + sb.n_sh - common)) * 10000.0 + 0.5)
             / 10000.0 AS jaccard
  FROM pairs
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= {thr}
""".format(thr=JACCARD_THRESHOLD)
)


@query(
    "dedup_exact",
    oracle="""
        SELECT text, min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM documents WHERE text IS NOT NULL
        GROUP BY text
    """,
    doc="exact dedup: hash-groupBy on content, keep min id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "dedup_ngram_jaccard_pairs",
    oracle=_DUCK_JACCARD_PAIRS,
    doc="brute-force word-3-gram Jaccard near-dup pairs via shingle inverted index",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashed=True (r15): the production path — the posting-list
    # self-join keys on xxhash64(shingle) (8 bytes) instead of the
    # shingle string (guide §2.3, narrower shuffle keys; interleaved
    # A/B at sf0.1: ~-20% per run, identical rows). Result equality
    # with the exact-string path is pinned by
    # test_jaccard_pairs_hashed_equals_string_keys, and this query's
    # rows were value-hash-verified against the DuckDB oracle (which
    # always compares exact strings) at sf0.001/0.01/0.1 before the
    # switch; dedup_components keeps an exact-string graded twin of
    # the same pair plan.
    #
    # Collision bound (r16): hashed keys are probabilistically, not
    # mathematically, equal to exact strings — an xxhash64 collision
    # between two distinct shingles merges their posting lists and can
    # only OVER-report similarity (the safe direction for dedup). By
    # the birthday bound, P(any collision) ~= d^2 / 2^65 for d distinct
    # shingles: negligible through d ~ 10^8 (~3e-4), and equality is
    # verified on this data at sf0.001/0.01/0.1. At ~10^10 distinct
    # shingles (100 TB class) at least one collision becomes likely
    # (~0.93); a deployment grading at that scale should re-verify
    # hashed parity or fall back to hashed=False, which this same
    # operator still implements.
    return D.jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        JACCARD_THRESHOLD,
        hashed=True,
    )


@query(
    "dedup_minhash_lsh_pairs",
    oracle=_DUCK_JACCARD_PAIRS,
    doc=(
        "MinHash(32)+LSH(16 bands x 2) candidates, exact-Jaccard verified; "
        "oracle = brute-force Jaccard (recall ~1 at this threshold)"
    ),
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", JACCARD_THRESHOLD
    )


@query(
    "dedup_simhash_pairs",
    oracle=None,  # xxhash64 has no DuckDB twin; driver records rows-only
    doc="SimHash-64 near-dup pairs, Hamming <= 3, 16-bit-chunk blocking",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_components",
    oracle=_DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + r"""
  , jp AS (
      SELECT id_a, id_b
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= {thr}
  ),
  edges AS (SELECT id_a AS u, id_b AS v FROM jp
            UNION SELECT id_b, id_a FROM jp),
  reach(id, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
  )
  SELECT id, min(label) AS component FROM reach GROUP BY id
""".replace("{thr}", str(JACCARD_THRESHOLD)),
    doc=(
        "near-dup clusters: iterative min-label propagation over the "
        "Jaccard pair graph; oracle = recursive-CTE transitive closure"
    ),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.components import connected_components

    pairs = D.jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        JACCARD_THRESHOLD,
        hashed=False,
    )
    return connected_components(pairs)


@query(
    "dedup_components_chain",
    oracle="""
        WITH RECURSIVE chain AS (
            SELECT doc_id,
                   lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev
            FROM documents
        ),
        edges AS (
            SELECT prev AS u, doc_id AS v FROM chain WHERE prev IS NOT NULL
            UNION
            SELECT doc_id, prev FROM chain WHERE prev IS NOT NULL
        ),
        reach(id, label) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
        )
        SELECT id, min(label) AS component FROM reach GROUP BY id
    """,
    doc=(
        "connected components on a DEEP graph: consecutive doc_ids per "
        "source form one long chain each (diameter ~ corpus/sources, "
        "~250 at sf0.1) — the case where plain diameter-bound label "
        "propagation dies and pointer jumping (O(log d) rounds) is "
        "required; oracle = recursive-CTE transitive closure"
    ),
)
def dedup_components_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.components import connected_components
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        d.select("doc_id", "source")
        .withColumn("prev", F.lag("doc_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return connected_components(pairs)


@query(
    "dedup_components_merge",
    oracle="""
        WITH RECURSIVE chain AS (
            SELECT doc_id,
                   lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev
            FROM documents
        ),
        edges AS (
            SELECT prev AS u, doc_id AS v FROM chain WHERE prev IS NOT NULL
            UNION
            SELECT doc_id, prev FROM chain WHERE prev IS NOT NULL
        ),
        reach(id, label) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
        )
        SELECT id, min(label) AS component FROM reach GROUP BY id
    """,
    doc=(
        "incremental clustering: the per-source chain graph arrives in "
        "two installments — edges avoiding doc_id%7=3 nodes are labeled "
        "first, then merge_components folds in the edges touching those "
        "nodes (cost ∝ touched components). Oracle = recursive-CTE "
        "closure of the FULL graph: merge must equal full recompute"
    ),
)
def dedup_components_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkstreamingtwitter_presidential_spark.operators.components import (
        connected_components,
        merge_components,
    )

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        d.select("doc_id", "source")
        .withColumn("prev", F.lag("doc_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    is_new = (F.col("id_a") % 7 == 3) | (F.col("id_b") % 7 == 3)
    base_labels = connected_components(pairs.filter(~is_new))
    return merge_components(base_labels, pairs.filter(is_new))


@query(
    "dedup_incremental",
    # ORACLE RECALL CAVEAT (r2 advice): the Spark side is probabilistic
    # 16x2-band MinHash-LSH; the oracle is EXACT brute-force Jaccard. At
    # the 0.5 threshold LSH recalls a candidate pair w.p. 1-(1-j^2)^16
    # (~0.99 at j=0.5), and on the CURRENT fixture every qualifying pair
    # happens to be recalled, so they agree exactly. If the fixture or
    # the MinHash coefficients ever change, a qualifying pair can
    # legitimately miss (~1% per pair near j=0.5) — re-verify that the
    # planted near-dup pairs all sit well above the threshold, or
    # restrict this oracle to LSH-recallable pairs before re-grading.
    oracle=f"""
        SELECT * FROM ({_DUCK_JACCARD_PAIRS})
        WHERE id_a % 5 = 0 OR id_b % 5 = 0
    """,
    doc=(
        "incremental dedup: 20% of docs (doc_id % 5 = 0) arrive as a new "
        "batch and LSH-join against the persisted base signature table — "
        "no base-vs-base recompute; oracle = brute-force Jaccard pairs "
        "restricted to pairs touching the new batch"
    ),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    base_sigs = D.lsh_signature_table(
        docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text"
    )
    new_sigs = D.lsh_signature_table(
        docs.filter(F.col("doc_id") % 5 == 0), "doc_id", "text"
    )
    return D.incremental_lsh_pairs(base_sigs, new_sigs, JACCARD_THRESHOLD)


@query(
    "dedup_embedding_top_pairs",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                   FROM embeddings WHERE embedding IS NOT NULL)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               floor(list_cosine_similarity(a.v, b.v) * 10000.0 + 0.5) / 10000.0
                   AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        ORDER BY cos_sim DESC, id_a, id_b
        LIMIT 20
    """,
    doc="embedding cosine near-dup: top-20 most-similar pairs, label-blocked",
)
def dedup_embedding_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_top_pairs(load_table(spark, sf_dir, "embeddings"))


@query(
    "dedup_canonicalize",
    oracle=_DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + r"""
  , jp AS (
      SELECT id_a, id_b
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= {thr}
  ),
  edges AS (SELECT id_a AS u, id_b AS v FROM jp
            UNION SELECT id_b, id_a FROM jp),
  reach(id, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.id
  ),
  comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
  fullset AS (
      SELECT doc.doc_id,
             COALESCE(c.component, doc.doc_id) AS component,
             doc.n_chars
      FROM documents doc LEFT JOIN comp c ON c.id = doc.doc_id
  )
  SELECT doc_id, component, canonical_id,
         (doc_id = canonical_id) AS is_canonical
  FROM (
      SELECT doc_id, component,
             FIRST_VALUE(doc_id) OVER (
                 PARTITION BY component ORDER BY n_chars DESC, doc_id
             ) AS canonical_id
      FROM fullset
  )
""".replace("{thr}", str(JACCARD_THRESHOLD)),
    doc=(
        "NEW r5: survivor selection — the step AFTER clustering in a "
        "dedup pipeline: every doc gets its near-dup component, the "
        "cluster's canonical survivor (highest n_chars, ties to the "
        "smallest id), and the keep/drop verdict. Non-clustered docs "
        "pass through an anti-join map-only; the per-component window "
        "shuffles only the clustered slice — never the corpus; oracle "
        "= recursive-CTE closure + the same window"
    ),
)
def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.components import (
        canonical_members,
        connected_components,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, "doc_id", "text", JACCARD_THRESHOLD, hashed=False)
    labels = connected_components(pairs)
    return canonical_members(d, labels, "doc_id", "n_chars")


SEMANTIC_THRESHOLD = 0.4  # fixture embeddings have no planted semantic
# dups (max within-block cosine ~0.47), so the graded bar sits where
# real component structure exists; production SemDeDup over model
# embeddings runs ~0.95+ with an IVF-cell block key.


@query(
    "dedup_semantic_keep",
    oracle=f"""
        WITH RECURSIVE e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, label
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        jp AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.v, b.v) >= {SEMANTIC_THRESHOLD}
        ),
        edges AS (SELECT id_a AS u, id_b AS v FROM jp
                  UNION SELECT id_b, id_a FROM jp),
        reach(id, lab) AS (
          SELECT u, u FROM edges
          UNION
          SELECT edges.u, r.lab FROM edges JOIN reach r ON edges.v = r.id
        ),
        comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        fullset AS (
          SELECT e.vec_id, COALESCE(c.component, e.vec_id) AS component
          FROM e LEFT JOIN comp c ON c.id = e.vec_id
        )
        SELECT vec_id, component, canonical_id,
               (vec_id = canonical_id) AS is_canonical
        FROM (
          SELECT vec_id, component,
                 FIRST_VALUE(vec_id) OVER (
                     PARTITION BY component ORDER BY vec_id
                 ) AS canonical_id
          FROM fullset
        )
    """,
    doc=(
        "NEW r5: SemDeDup-shaped semantic dedup — blocked cosine edges "
        f">= {SEMANTIC_THRESHOLD} -> connected components -> smallest-id "
        "representative per component; every vector gets a keep/drop "
        "verdict; oracle = recursive-CTE closure + the same window"
    ),
)
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), SEMANTIC_THRESHOLD
    )


#: Same deterministic multi-line synthesis as text_c4_line_clean (the
#: fixture's docs are single-line; the appended per-doc-id lines are the
#: cross-doc boilerplate the paragraph dedup must find).
_SYNTH_SQL = r"""
        SELECT doc_id,
               replace(text, ' batch ', '.' || chr(10))
               || CASE WHEN doc_id % 7 = 0
                       THEN chr(10) || 'embedded javascript snippet here.'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN chr(10) || 'function f() { return 1; }'
                       ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                       THEN chr(10) || 'lorem ipsum dolor sit amet.'
                       ELSE '' END AS text
        FROM documents WHERE text IS NOT NULL
"""


@query(
    "dedup_paragraphs_clean",
    oracle=f"""
        WITH synth AS ({_SYNTH_SQL}),
        base AS (
            SELECT doc_id,
                   list_filter(list_transform(string_split(text, chr(10)),
                                              l -> trim(l)),
                               l -> length(l) > 0) AS lines
            FROM synth
        ),
        paras AS (
            SELECT doc_id, i - 1 AS idx, lines[i] AS para
            FROM base, UNNEST(range(1, len(lines) + 1)) AS t(i)
        ),
        dup AS (
            SELECT para FROM (
                SELECT para, COUNT(DISTINCT doc_id) AS nd
                FROM paras GROUP BY para
            ) WHERE nd >= 2
        ),
        kept AS (
            SELECT p.doc_id, p.idx, p.para
            FROM paras p ANTI JOIN dup USING (para)
        ),
        tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id),
        asm AS (
            SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(para, chr(10) ORDER BY idx) AS clean_text
            FROM kept GROUP BY doc_id
        )
        SELECT tot.doc_id,
               n_paras,
               n_paras - COALESCE(n_kept, 0) AS n_dropped,
               COALESCE(clean_text, '') AS clean_text
        FROM tot LEFT JOIN asm USING (doc_id)
    """,
    doc=(
        "NEW r5: paragraph-granular exact dedup (the RefinedWeb middle "
        "layer) — a paragraph in >= 2 distinct docs is boilerplate and "
        "removed from every doc, within-doc repeats survive, surviving "
        "paragraphs rejoin in order; same synthesized multi-line corpus "
        "as the C4 query (the appended per-doc-id lines ARE the planted "
        "boilerplate), oracle rebuilds the exact survivor texts"
    ),
)
def dedup_paragraphs_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    synth = F.concat(
        F.replace(F.col("text"), F.lit(" batch "), F.lit(".\n")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(7)) == 0,
            F.lit("\nembedded javascript snippet here."),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(11)) == 0,
            F.lit("\nfunction f() { return 1; }"),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(13)) == 0,
            F.lit("\nlorem ipsum dolor sit amet."),
        ).otherwise(F.lit("")),
    )
    # hashed=False: exact paragraph strings for the DuckDB oracle twin;
    # production default is hashed=True (8-byte keys).
    return D.paragraph_dedup(d.select("doc_id", synth.alias("text")), hashed=False)


@query(
    "dedup_exact_case_insensitive",
    oracle="""
        WITH synth AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END
                       AS text
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY lower(text)) AS keeper_id,
               COUNT(*) OVER (PARTITION BY lower(text)) AS n_copies,
               doc_id = MIN(doc_id) OVER (PARTITION BY lower(text)) AS keep
        FROM synth
    """,
    doc=(
        "NEW r6: collation-aware exact dedup (Spark 4 collations) — "
        "every 7th doc uppercased (casing varies by scrape, content "
        "identical), then grouped under UTF8_LCASE comparison IN the "
        "window key (F.collate; no lower() shadow column): keeper, copy "
        "count, and keep verdict per row must equal the lower()-window "
        "oracle exactly on the ASCII fixture (where ICU lowercase-"
        "comparison and lower() agree by construction)"
    ),
)
def dedup_exact_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    synth = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.upper("text"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return D.exact_dedup_ci(synth, "text", "doc_id").select(
        "doc_id", "keeper_id", "n_copies", "keep"
    )
