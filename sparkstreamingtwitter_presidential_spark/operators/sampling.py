"""Deterministic sampling / dataset-mixing operators.

Training-data pipelines re-weight corpora ("2 parts web, 1 part books,
0.1 parts forums") and need the SAME rows selected on every run, every
engine, and every retry — seeded `df.sample` can't promise that (its
output depends on partitioning), so these operators derive the keep
decision from an arithmetic hash of the row id: pure integer ops,
reproducible anywhere, exactly expressible in the DuckDB oracle.

The hash is Knuth's multiplicative scheme: ``(id * 2654435761) mod
2^31`` — the golden-ratio multiplier equidistributes consecutive ids,
so sequential doc_ids don't alias the threshold. Everything stays in
BIGINT (ids up to 2^31 keep the product under 2^63) and the keep test
compares against an INTEGER threshold ``floor(rate * 2^31)`` — no
floats anywhere, so cross-engine equality is exact, not approximate.

Scale: a sample/mix is a stateless per-row filter — no shuffle, no
state, pushes down past column pruning; at 100 TB it runs at scan
speed and composes with any downstream operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MULT = 2654435761  # Knuth multiplicative (2^32 / golden ratio)
HASH_MOD = 1 << 31


def sample_hash(id_col: Column | str) -> Column:
    """Deterministic uniform hash of an integer id in [0, 2^31).

    Mod semantics: Spark's pmod is always non-negative, while SQL ``%``
    takes the dividend's sign — an oracle/twin on another engine must
    use the pmod-equivalent form ``((x % m) + m) % m`` (as the registered
    DuckDB oracles do) so selection agrees for ALL int64 ids, negative
    included — never bare ``%``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(c.cast("long") * F.lit(HASH_MULT), F.lit(HASH_MOD))


def rate_threshold(rate: float) -> int:
    """Integer keep-threshold for a sampling rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * HASH_MOD)


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by id hash: stable across runs,
    partitionings, and engines (unlike seeded df.sample)."""
    return df.filter(sample_hash(id_col) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Dataset mixing: keep ~``rates[stratum]`` of each stratum's rows
    (``default_rate`` for unlisted strata), deterministically by id
    hash. One stateless filter — the per-stratum threshold is a CASE
    over the stratum column, so no join, shuffle, or second pass."""
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(rate_threshold(rate))).otherwise(thr)
    return df.filter(sample_hash(id_col) < thr)


#: Epoch salt for oversampling: a large odd prime, small enough that
#: id + epoch * SALT stays far below 2^32 for 2^31-bounded ids, keeping
#: the product with HASH_MULT inside int64.
EPOCH_SALT = 1_000_003


def epoch_hash(id_col: Column | str, epoch: int) -> Column:
    """Per-epoch variant of sample_hash: epoch 0 equals sample_hash (so
    a weight-1.0 mix is exactly the identity selection); higher epochs
    decorrelate via an additive salt, so the fractional remainder of
    epoch k keeps a DIFFERENT subset than epoch k-1 kept."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        (c.cast("long") + F.lit(epoch * EPOCH_SALT)) * F.lit(HASH_MULT),
        F.lit(HASH_MOD),
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    parts: dict[str, float],
) -> DataFrame:
    """Corpus re-weighting WITH oversampling ("2.5 parts web, 0.5 parts
    forums"): each stratum contributes ``floor(parts)`` full copies plus
    a deterministic hash-selected fraction, tagged with an ``epoch``
    column (0-based copy number) so downstream packing/shuffling can
    interleave copies instead of concatenating them. Strata not listed
    contribute nothing.

    Plan shape: one scan per epoch level (max over the weights' integer
    parts + 1), each a stateless pushed-down filter, unioned — no
    shuffle, no join, no state; at 100 TB each epoch scan prunes to the
    strata that reach that epoch. Epoch k of a stratum with weight w
    keeps rate min(1, w - k) via the epoch-salted hash, so retries,
    partitionings, and engines all select identical rows."""
    if not parts:
        raise ValueError("parts must name at least one stratum")
    for k, w in parts.items():
        if w < 0:
            raise ValueError(f"negative weight for {k!r}: {w}")
    max_epoch = max(int(w) + (0 if w == int(w) else 1) for w in parts.values())
    pieces = []
    for epoch in range(max_epoch):
        # strata whose weight reaches into this epoch; full copies keep
        # everything (threshold = MOD), partial epochs hash-select
        cond = F.lit(False)
        thr: Column = F.lit(0)
        for value, w in sorted(parts.items()):
            rate = min(1.0, w - epoch)
            if rate <= 0:
                continue
            cond = cond | (F.col(strata_col) == value)
            thr = F.when(
                F.col(strata_col) == value, F.lit(rate_threshold(rate))
            ).otherwise(thr)
        piece = (
            df.filter(cond)
            .filter(epoch_hash(id_col, epoch) < thr)
            .withColumn("epoch", F.lit(epoch).cast("int"))
        )
        pieces.append(piece)
    if not pieces:
        raise ValueError(
            "all weights in `parts` are zero — the mix would be empty; "
            "drop unwanted strata from `parts` instead of zeroing them"
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def sharded_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    salt: int = 0,
) -> DataFrame:
    """Deterministic corpus shuffle for training-data assembly: every
    row gets a ``shard`` (hash bucket) and a 1-based ``pos`` within its
    shard, ordered by the salted hash — the standard shard-and-shuffle
    a trainer consumes (readers stream shard files; within-shard order
    IS the shuffled order; change ``salt`` to reshuffle between runs,
    identically on every engine/partitioning/retry).

    Scale shape: ONE shuffle (hash-partition by shard), then each
    shard sorts independently inside its window task — there is no
    global sort and no single-partition bottleneck; ``n_shards`` is
    the parallelism knob (size it to the cluster, like output files).
    Pure BIGINT arithmetic end to end, so a SQL oracle reproduces the
    exact permutation."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window

    h = epoch_hash(F.col(id_col), salt)
    out = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return out.withColumn("pos", F.row_number().over(w)).drop("_h")


def split_assign(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """Deterministic train/val/test (or any named) split: adds a
    ``split`` column assigning each row to a partition of the hash
    space by cumulative-fraction thresholds, in the dict's insertion
    order. Fractions must sum to 1 (±1e-9): a split is a PARTITION of
    the corpus — every row lands in exactly one named slice, so
    train/val/test can never overlap or drop rows, on any engine.

    Same scale shape as the samplers: stateless per-row arithmetic on
    the id hash, no shuffle; ``salt`` re-deals the split without
    touching the data (holdout rotation). The boundary thresholds are
    integers, so the slice sizes are exact hash-measure fractions and
    the assignment is reproducible everywhere the oracle runs.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {name!r}: {frac}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = epoch_hash(F.col(id_col), salt)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        branch = F.when(h < F.lit(int(cum * HASH_MOD)), F.lit(name))
        expr = branch if expr is None else expr.when(
            h < F.lit(int(cum * HASH_MOD)), F.lit(name)
        )
    # the last slice absorbs the rounding remainder: thresholds are
    # floor()ed, so "everything else" is the only exact complement
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)
