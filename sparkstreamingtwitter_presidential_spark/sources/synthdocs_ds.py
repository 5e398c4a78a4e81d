"""Deterministic corpus generator as a Python DataSource — the dbgen
pattern: a registered format that MATERIALIZES NOTHING and generates
its partition's row range on the executor,

    spark.read.format("synthdocs")
         .option("n_rows", 100_000).option("n_partitions", 64).load()

so scale tests can read a 100x corpus without staging 100x bytes
(generation cost is CPU-per-row; storage cost is zero). Partitioning
is row-range slicing: the dataset is a pure function of row index i,
so ANY n_partitions yields byte-identical content — partition
invariance is the generator's correctness property and is graded.

Every derivation uses small-modulus integer arithmetic (products
< 2^63, no 64-bit wraparound) so a SQL engine reproduces it EXACTLY:
the DuckDB oracle rebuilds the same rows from range(n) — a custom
PYTHON source proven value-exact against a relational twin.

Schema mirrors the fixture documents table (doc_id, text, lang,
source, n_chars).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from sparkstreamingtwitter_presidential_spark.sources.stream_progress import (
    load_high_water,
    save_high_water,
)

_DDL = "doc_id long, text string, lang string, source string, n_chars int"

#: Fixed generation constants — mirrored literally in the SQL twin.
VOCAB = (
    "spark table row scan join filter group sort merge window batch "
    "stream key value data query plan index shuffle cache part order "
    "line text hash count range split limit stage task node"
).split()
LANGS = ("en", "fr", "de", "es", "zh")
A = 2654435761  # Knuth multiplicative constant
M = 2147483647  # 2^31 - 1
B = 40503


def gen_row(i: int) -> tuple:
    """The whole dataset is this pure function of the row index."""
    h = ((i + 1) * A) % M
    n_words = 5 + h % 20
    words = [
        VOCAB[(((i + 1) * A + (j + 1) * B) % M) % len(VOCAB)]
        for j in range(n_words)
    ]
    text = " ".join(words)
    return (i, text, LANGS[h % len(LANGS)], f"src{h % 20}", len(text))


@dataclass
class _RangePartition(InputPartition):
    lo: int
    hi: int


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", "1000"))
        self.n_parts = max(1, int(options.get("n_partitions", "8")))
        if self.n_rows < 0:
            raise ValueError("synthdocs: n_rows must be >= 0")

    def partitions(self):
        step = -(-self.n_rows // self.n_parts) if self.n_rows else 1
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield gen_row(i)


class SynthDocsStreamReader(DataSourceStreamReader):
    """Streaming mode: a deterministic rate source. Each micro-batch
    admits the next ``rows_per_batch`` row indices (offset = row
    index), sliced into ``n_partitions`` range partitions — so a
    streaming job can be driven with reproducible, zero-storage input
    at a controlled rate (the benchmarking twin of the builtin `rate`
    source, but with corpus-shaped rows and exact replayability: batch
    k is ALWAYS rows [k*r, (k+1)*r) whatever the wall clock did).
    ``max_rows`` (0 = unbounded) lets tests drain to quiescence.

    Restart contract: the Python DataSource protocol gives a fresh
    reader NO restore signal on a clean restart (last batch committed)
    — Spark calls latestOffset() directly, and a reader that counts
    from zero would move the offset log BACKWARD and re-emit rows
    already delivered. Pass ``progress_dir`` (any writable directory;
    the query's checkpoint dir is natural) and the reader persists its
    high-water mark there on every commit and re-seeds from it on
    construction, making latestOffset monotone across restarts. An
    uncommitted-batch replay is safe either way (partitions() seeds
    the mark from the replayed end offset). Without ``progress_dir`` a
    CLEAN restart restarts emission at row 0 — fine for one-shot
    drain-to-quiescence tests, wrong for restartable appends, hence
    the loud note here."""

    def __init__(self, options):
        self.rate = int(options.get("rows_per_batch", "1000"))
        self.n_parts = max(1, int(options.get("n_partitions", "4")))
        self.max_rows = int(options.get("max_rows", "0"))
        self.progress_dir = options.get("progress_dir")
        self._emitted = load_high_water(self.progress_dir, "synthdocs") or 0

    def initialOffset(self) -> dict:
        # the stream's logical beginning. NOT self._emitted: Spark
        # calls latestOffset() BEFORE initialOffset() even on a cold
        # start, so returning the (already advanced) mark here would
        # make batch 0 skip the first rows.
        return {"row": 0}

    def latestOffset(self) -> dict:
        nxt = self._emitted + self.rate
        if self.max_rows:
            nxt = min(nxt, self.max_rows)
        nxt = max(nxt, self._emitted)  # monotone, never regress
        self._emitted = nxt
        return {"row": nxt}

    def partitions(self, start: dict, end: dict):
        self._emitted = max(self._emitted, end["row"])
        lo, hi = start["row"], end["row"]
        step = max(1, -(-(hi - lo) // self.n_parts))
        return [
            _RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield gen_row(i)

    def commit(self, end: dict) -> None:
        self._emitted = max(self._emitted, end["row"])
        save_high_water(self.progress_dir, "synthdocs", self._emitted)


class SynthDocsDataSource(DataSource):
    """format("synthdocs"): zero-storage deterministic documents."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return _DDL

    def reader(self, schema: StructType) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def streamReader(self, schema: StructType) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark: SparkSession) -> None:
    """Idempotent registration of the generator on a session."""
    spark.dataSource.register(SynthDocsDataSource)


def synthdocs_oracle_sql(n_rows: int) -> str:
    """The DuckDB twin: identical integer arithmetic over range(n)."""
    vocab = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    langs = "[" + ", ".join(f"'{x}'" for x in LANGS) + "]"
    return f"""
        WITH g AS (
            SELECT i, ((i + 1) * {A}) % {M} AS h
            FROM range({n_rows}) t(i)
        ), w AS (
            SELECT i, h,
                   array_to_string(
                       list_transform(
                           range(5 + h % 20),
                           j -> ({vocab})[
                               ((((i + 1) * {A} + (j + 1) * {B}) % {M})
                                % {len(VOCAB)}) + 1]),
                       ' ') AS text
            FROM g
        )
        SELECT i AS doc_id,
               text,
               ({langs})[(h % {len(LANGS)}) + 1] AS lang,
               'src' || (h % 20) AS source,
               CAST(length(text) AS INT) AS n_chars
        FROM w
    """
