"""Minimal native Apache Hudi COPY-ON-WRITE reader/writer over the
PUBLIC table layout (hudi.apache.org/docs — timeline, file layouts,
and the "Technical Specification" pages) — no jars, no external deps;
the same native-connector policy as `sources/delta.py` and
`sources/iceberg.py`, completing the three-format lakehouse family.
Hudi's on-disk contract is files:

  .hoodie/hoodie.properties            table name/type/version +
                                       record-key field (java
                                       Properties, key=value lines)
  .hoodie/<instant>.commit.requested   timeline: planned
  .hoodie/<instant>.inflight           timeline: in progress
  .hoodie/<instant>.commit             timeline: COMPLETED (JSON with
                                       per-partition write stats)
  <fileId>_<writeToken>_<instant>.parquet   base files (CoW slices)

The three core Hudi ideas this module implements faithfully:

* **Timeline**: instants are millisecond timestamps
  (yyyyMMddHHmmssSSS) ordered lexicographically; an action is durable
  iff its COMPLETED file exists. Completion is one O_CREAT|O_EXCL
  create — the same put-if-absent atomicity as the Delta/Iceberg
  twins (object stores interpose a catalog/lock provider; same
  honesty note).
* **File groups and slices**: every record maps to one file group
  (stable `fileId`); each write to a group produces a new SLICE of
  that group (same fileId, new instant). A snapshot read takes, per
  group, the newest slice whose instant is a completed commit —
  which is what makes CoW upserts, time travel, and rollback cheap:
  superseded slices simply stop being selected.
* **Meta columns**: every base file physically stores
  `_hoodie_commit_time`, `_hoodie_commit_seqno`,
  `_hoodie_record_key`, `_hoodie_partition_path`,
  `_hoodie_file_name` ahead of the data columns; incremental reads
  are a plain filter on `_hoodie_commit_time` over the slices the
  timeline says a commit range touched.

Coverage: CoW tables, unpartitioned layout, insert + record-key
upsert commits (file-group-targeted rewrite — cost ∝ matched groups,
never the table), snapshot read (with or without meta columns), time
travel by completed instant, incremental pull (commit-time range),
rollback of the latest commit, and clean (retire superseded slices,
keep_last guard). Refusals (clear NotImplementedError/ValueError
rather than wrong rows): MERGE_ON_READ tables and `.log` delta files,
partitioned tables (partition-path layouts need the key-generator
surface; the Delta/Iceberg twins demonstrate partitioning), foreign
tables without the record-key property, bootstrap/clustering/metadata
-table features.

Reference scope note: the reference persists micro-batches as plain
text (Collector.scala:84-96); the lakehouse connectors are the
engine-extension surface, and Hudi completes that family's
format coverage.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HOODIE_DIR = ".hoodie"
_PROPS = "hoodie.properties"
META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


class HudiCommitConflict(RuntimeError):
    """Another writer completed this instant (or a later one raced the
    plan). Re-read and retry, as with the Delta/Iceberg twins."""


# ---------------------------------------------------------------- layout


def _hoodie(path: str) -> str:
    return os.path.join(path, _HOODIE_DIR)


def _load_props(path: str) -> dict[str, str]:
    props_file = os.path.join(_hoodie(path), _PROPS)
    if not os.path.isfile(props_file):
        raise FileNotFoundError(f"not a Hudi table (no .hoodie/): {path}")
    out: dict[str, str] = {}
    with open(props_file, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition("=")
            out[k] = v
    if out.get("hoodie.table.type", "COPY_ON_WRITE") != "COPY_ON_WRITE":
        raise NotImplementedError(
            "MERGE_ON_READ Hudi tables (delta log files) are not "
            "supported by this native reader (CoW only)"
        )
    return out


def _completed_commits(path: str) -> list[str]:
    """Sorted instants with a COMPLETED .commit file (the only state
    readers trust; requested/inflight are invisible)."""
    hd = _hoodie(path)
    return sorted(
        n[: -len(".commit")]
        for n in os.listdir(hd)
        if n.endswith(".commit") and not n.endswith(".commit.requested")
    )


def _base_files(path: str) -> list[tuple[str, str, str]]:
    """(file_id, instant, full_path) for every base parquet under the
    (unpartitioned) table root. Hudi file name contract:
    <fileId>_<writeToken>_<instant>.parquet."""
    out = []
    for n in sorted(os.listdir(path)):
        if not n.endswith(".parquet"):
            continue
        stem = n[: -len(".parquet")]
        parts = stem.split("_")
        if len(parts) != 3:
            raise NotImplementedError(
                f"unrecognized Hudi base-file name {n!r} (expected "
                "<fileId>_<writeToken>_<instant>.parquet)"
            )
        file_id, _token, instant = parts
        out.append((file_id, instant, os.path.join(path, n)))
    for n in os.listdir(path):
        if n.endswith(".log") or ".log." in n:
            raise NotImplementedError(
                "MERGE_ON_READ log files present; this native reader "
                "is CoW-only"
            )
    return out


def _latest_slices(
    path: str, as_of: str | None = None
) -> list[tuple[str, str, str]]:
    """Per file group, the newest slice whose instant is a COMPLETED
    commit (≤ ``as_of`` when time traveling). Slices from inflight or
    rolled-back instants are invisible — that is the CoW isolation
    story."""
    commits = set(_completed_commits(path))
    if as_of is not None:
        commits = {c for c in commits if c <= as_of}
    best: dict[str, tuple[str, str]] = {}
    for file_id, instant, full in _base_files(path):
        if instant not in commits:
            continue
        cur = best.get(file_id)
        if cur is None or instant > cur[0]:
            best[file_id] = (instant, full)
    return [(fid, inst, full) for fid, (inst, full) in sorted(best.items())]


# ---------------------------------------------------------------- instants


def _new_instant(path: str) -> str:
    """Millisecond commit instant (yyyyMMddHHmmssSSS), strictly above
    every instant already on the timeline (clock skew or same-ms
    writes bump by one)."""
    t = time.gmtime()
    ms = int(time.time() * 1000) % 1000
    inst = time.strftime("%Y%m%d%H%M%S", t) + f"{ms:03d}"
    hd = _hoodie(path)
    existing = [
        n.split(".")[0]
        for n in os.listdir(hd)
        if n[:1].isdigit()
    ]
    top = max(existing, default="")
    if inst <= top:
        inst = str(int(top) + 1).zfill(len(inst))
    return inst


def _complete_instant(path: str, instant: str, commit_meta: dict) -> None:
    """requested -> inflight -> COMPLETED; completion is the O_EXCL
    create of the .commit file (put-if-absent)."""
    hd = _hoodie(path)
    open(os.path.join(hd, f"{instant}.commit.requested"), "w").close()
    open(os.path.join(hd, f"{instant}.inflight"), "w").close()
    target = os.path.join(hd, f"{instant}.commit")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise HudiCommitConflict(
            f"instant {instant} of {path} completed concurrently; "
            "re-read the table and retry"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(commit_meta, fh)


# ---------------------------------------------------------------- writing


def _with_meta(
    df: DataFrame, record_key: str, instant: str, file_name_expr
) -> DataFrame:
    """Prepend the five Hudi meta columns (physically stored, like the
    real writer). Seqno is instant_partitionid_rowid-shaped; this
    writer uses a key-derived stable token so files are deterministic
    for a given input."""
    return df.select(
        F.lit(instant).alias("_hoodie_commit_time"),
        F.concat_ws(
            "_", F.lit(instant), F.xxhash64(F.col(record_key)).cast("string")
        ).alias("_hoodie_commit_seqno"),
        F.col(record_key).cast("string").alias("_hoodie_record_key"),
        F.lit("").alias("_hoodie_partition_path"),
        file_name_expr.alias("_hoodie_file_name"),
        "*",
    )


def _stage_slice(
    df: DataFrame,
    path: str,
    record_key: str,
    instant: str,
    file_id: str,
) -> str | None:
    """Write ONE file group slice: <fileId>_0-0-0_<instant>.parquet.
    Returns the file name (None for an empty frame). The real writer
    packs multiple groups per commit by bucketing; this writer maps
    each staged frame to one group — callers split frames per group."""
    name = f"{file_id}_0-0-0_{instant}.parquet"
    staged = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    _with_meta(df, record_key, instant, F.lit(name)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staged)
    part = [n for n in os.listdir(staged) if n.endswith(".parquet")]
    if not part:
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        return None
    os.replace(os.path.join(staged, part[0]), os.path.join(path, name))
    import shutil

    shutil.rmtree(staged, ignore_errors=True)
    return name


def write_hudi(
    df: DataFrame,
    path: str,
    record_key: str,
    mode: str = "append",
    n_file_groups: int = 1,
) -> str:
    """INSERT commit: create the table on first write (hoodie.properties
    + timeline), land ``df`` as ``n_file_groups`` NEW file groups, and
    complete the instant. ``record_key`` names the unique-key column
    (Hudi's mandatory record key; upserts join on it). Returns the
    commit instant.

    ``mode='overwrite'`` is the INSERT_OVERWRITE_TABLE shape: prior
    file groups stop being selected because their slices' instants
    remain but the commit records replacement — implemented CoW-simply
    by writing new groups and retiring the old ones in the commit
    metadata, then physically removing them on `clean_hudi`. For the
    honest subset here, overwrite REWRITES the live set: old slices
    stay on disk for time travel until cleaned."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if record_key not in df.columns:
        raise ValueError(f"record_key {record_key!r} not in {df.columns}")
    hd = _hoodie(path)
    exists = os.path.isfile(os.path.join(hd, _PROPS))
    if not exists:
        os.makedirs(hd, exist_ok=True)
        with open(os.path.join(hd, _PROPS), "w", encoding="utf-8") as fh:
            fh.write(
                "hoodie.table.name="
                + os.path.basename(path.rstrip("/"))
                + "\nhoodie.table.type=COPY_ON_WRITE"
                + "\nhoodie.table.version=6"
                + "\nhoodie.timeline.layout.version=1"
                + f"\nhoodie.table.recordkey.fields={record_key}\n"
            )
    else:
        props = _load_props(path)
        want = props.get("hoodie.table.recordkey.fields")
        if want and want != record_key:
            raise ValueError(
                f"record_key {record_key!r} != table's {want!r}"
            )
    instant = _new_instant(path)

    replaced: list[str] = []
    if mode == "overwrite" and exists:
        replaced = [fid for fid, _i, _f in _latest_slices(path)]

    names = []
    if n_file_groups > 1:
        # deterministic key-hash bucketing maps each record to its
        # file group (Hudi's index contract: a key lives in ONE group)
        bucket = F.pmod(F.xxhash64(F.col(record_key)), F.lit(n_file_groups))
        frames = [
            df.filter(bucket == i) for i in range(n_file_groups)
        ]
    else:
        frames = [df]
    for frame in frames:
        name = _stage_slice(
            frame, path, record_key, instant, uuid.uuid4().hex[:12]
        )
        if name:
            names.append(name)
    commit_meta = {
        "operationType": "INSERT_OVERWRITE_TABLE" if mode == "overwrite" else "INSERT",
        "partitionToWriteStats": {
            "": [{"path": n, "fileId": n.split("_")[0]} for n in names]
        },
    }
    if replaced:
        commit_meta["partitionToReplaceFileIds"] = {"": replaced}
    _complete_instant(path, instant, commit_meta)
    return instant


# ---------------------------------------------------------------- reading


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Snapshot read (CoW): per file group the newest completed slice
    (≤ ``as_of`` for time travel by instant), one distributed parquet
    scan over exactly those files. Meta columns are dropped unless
    ``keep_meta`` (the real reader's default surfaces them; dropping
    is this engine's analytics-friendly default — flip the flag for
    parity with hudi-spark output)."""
    _load_props(path)
    commits = _completed_commits(path)
    if as_of is not None and as_of not in commits:
        raise ValueError(
            f"as_of instant {as_of!r} is not a completed commit "
            f"(have {commits})"
        )
    use = [c for c in commits if as_of is None or c <= as_of]
    files = [
        full
        for fid, inst, full in _latest_slices(path, as_of=as_of)
        if _slice_after_replace(path, fid, inst, use)
    ]
    if not files:
        # an empty table still has a schema only if something was
        # written; surface the honest error instead of a guess
        raise ValueError(f"Hudi table {path} has no completed commits")
    df = spark.read.parquet(*files)
    return df if keep_meta else df.drop(*META_COLS)


def _slice_after_replace(
    path: str, fid: str, inst: str, commits: list[str]
) -> bool:
    """A replaced file group can be re-created by a later commit under
    a new write; a slice is live iff its instant is after the LAST
    commit that replaced its group."""
    hd = _hoodie(path)
    last_replace = ""
    for c in commits:
        try:
            with open(os.path.join(hd, f"{c}.commit"), encoding="utf-8") as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            continue
        for fids in (meta.get("partitionToReplaceFileIds") or {}).values():
            if fid in fids:
                last_replace = max(last_replace, c)
    return inst > last_replace


def read_hudi_incremental(
    spark: SparkSession,
    path: str,
    from_instant: str,
    to_instant: str | None = None,
) -> DataFrame:
    """Incremental pull: records written by commits in
    (``from_instant``, ``to_instant``] — scan only the slices those
    commits created and filter `_hoodie_commit_time` (upsert slices
    carry copied-over older rows; the meta-column filter is what makes
    the pull exact — Hudi's own incremental query semantics). Cost
    tracks the commits' files, never the table. Refuses overwrite
    commits inside the range, like the Delta/Iceberg twins refuse
    non-append commits (replaced data must not double-count)."""
    _load_props(path)
    commits = _completed_commits(path)
    hi = to_instant if to_instant is not None else (commits[-1] if commits else "")
    sel = [c for c in commits if from_instant < c <= hi]
    if not sel:
        return read_hudi(spark, path).limit(0)
    hd = _hoodie(path)
    files = []
    for c in sel:
        with open(os.path.join(hd, f"{c}.commit"), encoding="utf-8") as fh:
            meta = json.load(fh)
        if meta.get("operationType") == "INSERT_OVERWRITE_TABLE":
            raise ValueError(
                f"commit {c} in the incremental range is an overwrite — "
                "an incremental pull would misread replaced data; read "
                "full snapshots across it instead"
            )
        for stats in (meta.get("partitionToWriteStats") or {}).values():
            for st in stats:
                full = os.path.join(path, st["path"])
                if os.path.isfile(full):
                    files.append(full)
    if not files:
        return read_hudi(spark, path).limit(0)
    df = spark.read.parquet(*files)
    return (
        df.filter(
            (F.col("_hoodie_commit_time") > from_instant)
            & (F.col("_hoodie_commit_time") <= hi)
        )
        .drop(*META_COLS)
    )


def hudi_timeline(spark: SparkSession, path: str) -> DataFrame:
    """The timeline as a queryable frame: one row per completed commit
    with operation type and file/record stats (driver-side metadata,
    like describe_history / table_snapshots)."""
    _load_props(path)
    hd = _hoodie(path)
    rows = []
    for c in _completed_commits(path):
        with open(os.path.join(hd, f"{c}.commit"), encoding="utf-8") as fh:
            meta = json.load(fh)
        stats = [
            st
            for sts in (meta.get("partitionToWriteStats") or {}).values()
            for st in sts
        ]
        rows.append(
            (
                c,
                meta.get("operationType"),
                len(stats),
                len(
                    [
                        f
                        for fids in (
                            meta.get("partitionToReplaceFileIds") or {}
                        ).values()
                        for f in fids
                    ]
                ),
            )
        )
    return spark.createDataFrame(
        rows,
        "instant string, operation string, n_files long, n_replaced long",
    )


# ---------------------------------------------------------------- upsert


def upsert_hudi(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    record_key: str | None = None,
) -> str:
    """UPSERT commit (CoW): matched record keys take the source row's
    values, unmatched keys insert — Hudi's core write operation.
    File-group targeted: only groups containing matched keys write a
    NEW SLICE (same fileId, this instant — the snapshot reader flips
    to it atomically at completion); inserts land in one new group.
    Cost ∝ matched groups + inserts, never the table. Duplicate
    source keys are ambiguous — refused, same as the MERGE twins."""
    props = _load_props(path)
    key = record_key or props.get("hoodie.table.recordkey.fields")
    if not key:
        raise NotImplementedError(
            "foreign Hudi table without hoodie.table.recordkey.fields; "
            "pass record_key= explicitly"
        )
    if key not in source.columns:
        raise ValueError(f"record_key {key!r} not in source {source.columns}")
    dup = source.groupBy(key).count().filter("count > 1").limit(1).collect()
    if dup:
        raise ValueError(
            f"source has duplicate record keys (e.g. {dup[0][key]!r}); "
            "UPSERT would be ambiguous"
        )
    snap = read_hudi(spark, path, keep_meta=True)
    tcols = [c for c in snap.columns if c not in META_COLS]
    if sorted(source.columns) != sorted(tcols):
        raise ValueError(
            f"source columns {sorted(source.columns)} != table's {sorted(tcols)}"
        )
    source = source.select(*tcols)

    instant = _new_instant(path)
    file_col = F.element_at(F.split("_hoodie_file_name", "_"), 1)
    keyed = snap.withColumn("__fid", file_col)
    matches = (
        keyed.join(
            source.select(F.col(key).cast("string").alias("__sk")),
            keyed["_hoodie_record_key"] == F.col("__sk"),
            "leftsemi",
        )
        .select("__fid")
        .distinct()
        .collect()
    )
    matched_fids = sorted(r["__fid"] for r in matches)

    names = []
    matched_keys = None
    if matched_fids:
        src = source.select(
            *[F.col(c).alias(f"__src_{c}") for c in tcols]
        ).withColumn("__matched", F.lit(True))
        hit = keyed.filter(F.col("__fid").isin(matched_fids))
        joined = hit.join(
            src,
            hit["_hoodie_record_key"]
            == F.col(f"__src_{key}").cast("string"),
            "left",
        )
        m = F.coalesce(F.col("__matched"), F.lit(False))
        rewritten = joined.select(
            F.col("__fid"),
            *[
                F.when(m, F.col(f"__src_{c}")).otherwise(hit[c]).alias(c)
                for c in tcols
            ],
        )
        for fid in matched_fids:
            name = _stage_slice(
                rewritten.filter(F.col("__fid") == fid).drop("__fid"),
                path,
                key,
                instant,
                fid,
            )
            if name:
                names.append(name)
        matched_keys = (
            keyed.filter(F.col("__fid").isin(matched_fids))
            .select(F.col("_hoodie_record_key").alias("__mk"))
            .distinct()
        )

    inserts = source
    if matched_keys is not None:
        inserts = source.join(
            matched_keys,
            source[key].cast("string") == F.col("__mk"),
            "leftanti",
        )
    name = _stage_slice(inserts, path, key, instant, uuid.uuid4().hex[:12])
    if name:
        names.append(name)

    if not names:
        return _completed_commits(path)[-1]
    _complete_instant(
        path,
        instant,
        {
            "operationType": "UPSERT",
            "partitionToWriteStats": {
                "": [{"path": n, "fileId": n.split("_")[0]} for n in names]
            },
        },
    )
    return instant


# ------------------------------------------------------------ maintenance


def rollback_hudi(path: str, instant: str) -> list[str]:
    """Roll back the LATEST completed commit: delete its slices and
    timeline files — readers never selected uncompleted slices, so
    this is metadata-local. Only the latest commit may roll back (the
    real constraint: later commits' slices may shadow this one)."""
    commits = _completed_commits(path)
    if not commits or commits[-1] != instant:
        raise ValueError(
            f"only the latest completed commit may roll back "
            f"(latest {commits[-1] if commits else None!r}, got {instant!r})"
        )
    removed = []
    for _fid, inst, full in _base_files(path):
        if inst == instant:
            os.remove(full)
            removed.append(os.path.basename(full))
    hd = _hoodie(path)
    for suffix in (".commit", ".inflight", ".commit.requested"):
        try:
            os.remove(os.path.join(hd, f"{instant}{suffix}"))
        except OSError:
            pass
    return removed


def clean_hudi(path: str, keep_last: int = 1) -> list[str]:
    """Retire superseded slices (KEEP_LATEST_COMMITS-shaped): per file
    group, keep the slices referenced by the newest ``keep_last``
    completed commits; older superseded slices delete. Time travel to
    cleaned instants stops resolving (their files are gone) — the real
    cleaner's documented trade. Returns deleted file names."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    commits = _completed_commits(path)
    protected = set(commits[-keep_last:])
    live = {full for _f, _i, full in _latest_slices(path)}
    deleted = []
    for _fid, inst, full in _base_files(path):
        if full in live or inst in protected:
            continue
        os.remove(full)
        deleted.append(os.path.basename(full))
    return deleted
