"""Training-shard export with an integrity manifest — the final step
of a curation pipeline: hand the trainer a deterministic set of
shuffled JSONL shard files plus a manifest it can verify before (and
during) a multi-week run.

  export_jsonl_shards   deterministic shard-and-shuffle assignment
                        (operators/sampling.sharded_shuffle) -> one
                        JSONL file per shard (`shard=K/` Hive dirs),
                        within-file order == the shuffled order.
  build_manifest        DISTRIBUTED integrity scan: the shard files
                        are read back via Spark's binaryFile source
                        and hashed (sha256) + line-counted in an
                        Arrow-batched map pass — executors hash their
                        own files; only the n_shards manifest rows
                        (path, bytes, sha256, n_rows) reach the
                        driver, which writes `_MANIFEST.json`.
  verify_export         recompute the distributed scan and compare
                        against the stored manifest; any byte flip,
                        truncation, lost or extra file is reported
                        (raise or return the diff).

Why one file per shard: trainer readers stream whole shard files;
`repartition(n_shards, shard)` then `partitionBy(shard)` yields
exactly one part file per shard dir (each task holds whole shards),
and `sortWithinPartitions(shard, pos)` makes the line order the
shuffled order. n_shards is the parallelism knob, sized like output
files (~shard bytes = corpus/n_shards; keep under a few hundred MB
for gzip-style non-splittable consumers).

Scale: assignment is the one sharded_shuffle exchange; the write is
embarrassingly parallel; manifest hashing moves file BYTES through
executors but only manifest ROWS to the driver. Verification cost
equals one read of the export — the price of an integrity check, paid
by the cluster, not the driver.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkstreamingtwitter_presidential_spark.operators.sampling import sharded_shuffle

MANIFEST_NAME = "_MANIFEST.json"

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("file", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 16,
    salt: int = 0,
) -> None:
    """Write ``df`` as ``path/shard=K/part-*.json`` (one file per
    shard, lines in deterministic shuffled order), then write the
    integrity manifest. Fails if ``path`` exists (exports are
    immutable artifacts — write a new path per run)."""
    if os.path.exists(path):
        raise FileExistsError(f"export path exists: {path}")
    shards = sharded_shuffle(df, id_col, n_shards=n_shards, salt=salt)
    (
        shards.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .drop("pos")
        .write.partitionBy("shard")
        .json(path)
    )
    manifest = build_manifest(df.sparkSession, path)
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, os.path.join(path, MANIFEST_NAME))


def _scan_shards(spark: SparkSession, path: str) -> list[dict]:
    """Distributed (path, bytes, line count, sha256) over every shard
    part file; only manifest rows reach the driver.

    The file LIST is taken driver-side with a fresh glob (metadata
    only, n_shards entries) rather than a Spark file source — the
    session's FileStatusCache would otherwise serve a stale listing
    and a removed/appended file would crash the read instead of
    reporting as a diff. Executors open and hash their own files (on
    a cluster the part paths are object-store URIs and this open()
    becomes the storage client; bytes never visit the driver)."""
    import glob as _glob

    paths = sorted(_glob.glob(os.path.join(path, "shard=*", "part-*")))
    if not paths:
        return []
    pdf = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(min(len(paths), 32))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for b in batches:
            rows = []
            for p in b["path"]:
                with open(p, "rb") as f:
                    data = f.read()
                rel = "/".join(p.rsplit("/", 2)[-2:])  # shard=K/part-...
                shard = int(rel.split("/")[0].split("=")[1])
                rows.append(
                    {
                        "shard": shard,
                        "file": rel,
                        "n_bytes": len(data),
                        "n_rows": data.count(b"\n"),
                        "sha256": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _MANIFEST_SCHEMA])

    out = pdf.mapInPandas(hash_batches, schema=_MANIFEST_SCHEMA)
    return sorted(
        (r.asDict() for r in out.collect()), key=lambda d: (d["shard"], d["file"])
    )


def build_manifest(spark: SparkSession, path: str) -> dict:
    shards = _scan_shards(spark, path)
    return {
        "format": "jsonl-shards-v1",
        "n_shards": len({s["shard"] for s in shards}),
        "n_files": len(shards),
        "n_rows": sum(s["n_rows"] for s in shards),
        "n_bytes": sum(s["n_bytes"] for s in shards),
        "files": shards,
    }


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def verify_export(spark: SparkSession, path: str, raise_on_diff: bool = True) -> list[str]:
    """Recompute the distributed integrity scan and diff it against the
    stored manifest. Returns the list of problems (empty == intact);
    raises ValueError instead when ``raise_on_diff``."""
    stored = read_manifest(path)
    actual = {f["file"]: f for f in _scan_shards(spark, path)}
    expected = {f["file"]: f for f in stored["files"]}
    problems: list[str] = []
    for name in sorted(expected.keys() - actual.keys()):
        problems.append(f"missing file: {name}")
    for name in sorted(actual.keys() - expected.keys()):
        problems.append(f"unexpected file: {name}")
    for name in sorted(expected.keys() & actual.keys()):
        e, a = expected[name], actual[name]
        for k in ("n_bytes", "n_rows", "sha256"):
            if e[k] != a[k]:
                problems.append(f"{name}: {k} {e[k]!r} != {a[k]!r}")
    if problems and raise_on_diff:
        raise ValueError("export integrity check failed: " + "; ".join(problems))
    return problems


def read_jsonl_shards(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Read an export back (explicit schema — same no-inference policy
    as sources/jsonl.py). The `shard` partition column is recovered
    from the directory layout."""
    return spark.read.schema(schema).option("basePath", path).json(
        os.path.join(path, "shard=*")
    )
