"""Copy-on-write DML for the native Delta connector: DELETE, UPDATE,
MERGE (upsert), and OPTIMIZE (small-file compaction).

Reference parity: the reference engine's workflow is append-only
(README.md:88-208 — Hive external tables + streaming appends), so these
operators extend BEYOND it to the mutation surface a curation pipeline
needs (retract bad documents, fix labels, upsert refreshed crawls)
without rewriting the whole table.

Design (the same strategy the real delta-spark writer uses; since r10
every scan is deletion-vector-aware, so the ops below run directly on
MERGE-ON-READ tables too):

1. **Touch only affected files.** A DELETE/UPDATE/MERGE first finds the
   set of live files that contain at least one matching row — a
   metadata-sized driver list obtained from ``_metadata.file_path`` on a
   normal distributed scan (the predicate pushes down; unaffected files
   are never rewritten, and at 100 TB with partition-aligned predicates
   the affected set is the pruned partition, not the table).
2. **Rewrite distributed, commit atomically.** Affected files are
   re-read, transformed with plain Column expressions, and staged as new
   parquet via the connector's scratch-dir + rename path; ONE commit
   then tombstones the old files and adds the new — readers see either
   the old snapshot or the new, never a mix.
3. **Fail on conflict, never blind-retry.** Commits use the protocol's
   put-if-absent primitive; a concurrent commit raises
   DeltaCommitConflict (a remove derived from a stale snapshot is not
   safe to replay — same optimistic-concurrency contract as the real
   client).

OPTIMIZE is the same machinery with ``dataChange: false``: it bin-packs
small files per partition toward a target size, so downstream streaming
readers (which key on dataChange) correctly ignore it, and time travel
to pre-OPTIMIZE versions still works.
"""

from __future__ import annotations

import os
import urllib.parse
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    _assign_row_tracking,
    _column_mapping,
    _enforce_row_contracts,
    _generated_exprs,
    _recompute_generated,
    _mapping_field_ids,
    _refuse_unenforced_writer_contracts,
    _replay_log,
    _row_tracking_active,
    _rt_materialized_names,
    _Snapshot,
    _stage_files,
    commit_actions,
)


def _now_ms() -> int:
    import time

    return int(time.time() * 1000)


_FILE_COL = "__delta_file"
_POS_COL = "__delta_pos"


def _write_mapping(snap: _Snapshot, ctx: str) -> dict[str, str] | None:
    """Logical→physical name mapping for a DML rewrite, or None when
    the table is unmapped. Mirrors write_delta's contract (r10 — DML
    previously refused mapped tables outright): mapped tables work
    end-to-end — scans resolve physical names, rewrites stage
    physical-named files + partition dirs + parquet FIELD IDS from
    delta.columnMapping.id (so id-mode readers resolve them too). An
    id-mode table WITHOUT ids in its schema metadata refuses: staged
    files would not be resolvable by id-mode readers."""
    mapping = _column_mapping(snap)
    if mapping is not None:
        mode = (
            (snap.metadata_action or {}).get("configuration") or {}
        ).get("delta.columnMapping.mode")
        if mode == "id" and not _mapping_field_ids(snap):
            raise NotImplementedError(
                f"{ctx}: id-mode column-mapped table lacks "
                "delta.columnMapping.id field metadata; staged files "
                "would not be resolvable by id-mode readers"
            )
    return mapping


def _phys_select(df: DataFrame, snap: _Snapshot, mapping: dict[str, str]):
    """Rename a LOGICAL-named frame to physical names, attaching each
    column's parquet field id from delta.columnMapping.id (columns
    outside the mapping — e.g. cdc's _change_type — pass through)."""
    fids = _mapping_field_ids(snap)
    return df.select(
        *[
            (
                F.col(c).alias(
                    mapping[c], metadata={"parquet.field.id": fids[c]}
                )
                if c in mapping and c in fids
                else F.col(c).alias(mapping.get(c, c))
            )
            for c in df.columns
        ]
    )


def _stage_table_files(
    df: DataFrame,
    table_path: str,
    snap: _Snapshot,
    mapping: dict[str, str] | None,
) -> list[dict[str, Any]]:
    """Stage ``df`` (LOGICAL column names) as table data files. On a
    mapped table the files — and the partition dirs, hence the add's
    partitionValues keys — must store PHYSICAL names (the same rename
    write_delta's mapped append performs), so rewritten files keep the
    contract foreign readers resolve by."""
    if mapping is None:
        return _stage_files(df, table_path, snap.partition_columns)
    return _stage_files(
        _phys_select(df, snap, mapping),
        table_path,
        [mapping[c] for c in snap.partition_columns],
    )


def _stage_cdc_mapped(
    change_df: DataFrame,
    table_path: str,
    snap: _Snapshot,
    mapping: dict[str, str] | None,
) -> list[dict[str, Any]]:
    """Stage change-data files with the same physical-name contract as
    data files; ``_change_type`` is the protocol's own column and is
    never mapped."""
    if mapping is None:
        return _stage_cdc_files(change_df, table_path, snap.partition_columns)
    return _stage_cdc_files(
        _phys_select(change_df, snap, mapping),
        table_path,
        [mapping[c] for c in snap.partition_columns],
    )


def _dv_pairs_by_base(
    spark: SparkSession, path: str, snap: _Snapshot, dv_rels: list[str]
) -> DataFrame:
    """(file basename, row position) frame of every deleted row in
    ``dv_rels``'s deletion vectors — the build side for basename-keyed
    anti-joins (_scan_with_file(apply_dvs=True), REORG). Delegates to
    delta.dv_pairs_frame (the shared driver-vs-executor decode split)
    with basenames as the key space."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        dv_pairs_frame,
    )

    return dv_pairs_frame(
        spark,
        path,
        [
            (
                urllib.parse.unquote(p).split("/")[-1],
                snap.files[p]["deletionVector"],
            )
            for p in dv_rels
        ],
        f"{_FILE_COL} string, {_POS_COL} long",
    )


def _scan_with_file(
    spark: SparkSession,
    path: str,
    snap: _Snapshot,
    with_pos: bool = False,
    apply_dvs: bool = False,
    extra_phys_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed scan of the snapshot's live files with one extra
    column: the file's basename (``__delta_file``). Basenames are
    unique across the table (every staged file is uuid-named), so they
    key back to the log's relative paths driver-side. Partition columns
    are injected from the log exactly as in read_delta.

    ``with_pos`` adds ``__delta_pos`` = ``_metadata.row_index`` (the
    file-relative row ordinal deletion vectors are keyed by).

    Column-mapped tables (r10): the parquet files store PHYSICAL names,
    so the scan schema uses them and aliases back to logical in the
    same select (predicates and SET expressions downstream see logical
    names, exactly like read_delta); add.partitionValues are keyed by
    physical name with a logical-keyed fallback for lenient writers.

    ``apply_dvs`` (r10): rows a live deletion vector marks deleted are
    REMOVED from the scan (basename-keyed anti-join) — what lets CoW
    DML run directly on MOR tables without resurrecting deleted rows.
    The DV writers keep raw scans (their fresh-vs-old logic owns the
    vectors).

    ``extra_phys_cols`` (r12): additional PHYSICAL long columns read
    from the data files verbatim (parquet fills null where absent) —
    what the row-tracking reader uses to surface materialized
    row-id/commit-version columns that live outside the table schema."""
    dv_rels = (
        sorted(p for p, a in snap.files.items() if a.get("deletionVector"))
        if apply_dvs
        else []
    )
    if dv_rels:
        raw = _scan_with_file(
            spark, path, snap, with_pos=True,
            extra_phys_cols=extra_phys_cols,
        )
        out = raw.join(
            _dv_pairs_by_base(spark, path, snap, dv_rels),
            on=[_FILE_COL, _POS_COL],
            how="left_anti",
        )
        return out if with_pos else out.drop(_POS_COL)
    schema = snap.schema
    assert schema is not None
    mapping = _column_mapping(snap)
    phys = (lambda c: mapping[c]) if mapping else (lambda c: c)
    data_fields = [
        f for f in schema.fields if f.name not in snap.partition_columns
    ]
    data_schema = StructType(
        [StructField(phys(f.name), f.dataType, f.nullable) for f in data_fields]
        + [StructField(c, LongType(), True) for c in extra_phys_cols]
    )
    data_sel = [F.col(phys(f.name)).alias(f.name) for f in data_fields] + [
        F.col(c) for c in extra_phys_cols
    ]
    part_types = {
        f.name: f.dataType
        for f in schema.fields
        if f.name in snap.partition_columns
    }
    extra_cols = [
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias(_FILE_COL)
    ]
    if with_pos:
        extra_cols.append(F.col("_metadata.row_index").alias(_POS_COL))
    extra_names = [_FILE_COL] + ([_POS_COL] if with_pos else [])

    def _file(p: str) -> str:
        return os.path.join(path, urllib.parse.unquote(p))

    cols = [f.name for f in schema.fields]
    if not snap.files:
        out = spark.createDataFrame([], schema)
        for c in extra_phys_cols:
            out = out.withColumn(c, F.lit(None).cast("long"))
        out = out.withColumn(_FILE_COL, F.lit(None).cast("string"))
        if with_pos:
            out = out.withColumn(_POS_COL, F.lit(None).cast("long"))
        return out
    if not snap.partition_columns:
        return spark.read.schema(data_schema).parquet(
            *[_file(p) for p in sorted(snap.files)]
        ).select(*data_sel, *extra_cols)

    groups: dict[tuple, list[str]] = {}
    for p, a in snap.files.items():
        pv = a.get("partitionValues", {})
        key = tuple(
            pv.get(phys(c), pv.get(c)) for c in snap.partition_columns
        )
        groups.setdefault(key, []).append(_file(p))
    parts = []
    for key, paths in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        df = spark.read.schema(data_schema).parquet(*sorted(paths)).select(
            *data_sel, *extra_cols
        )
        for col, val in zip(snap.partition_columns, key):
            df = df.withColumn(col, F.lit(val).cast(part_types[col]))
        parts.append(df.select(*cols, *extra_phys_cols, *extra_names))
    from functools import reduce

    return reduce(DataFrame.unionByName, parts)


def _rel_by_base(snap: _Snapshot) -> dict[str, str]:
    out = {}
    for rel in snap.files:
        base = urllib.parse.unquote(rel).split("/")[-1]
        if base in out:  # uuid names make this unreachable; stay honest
            raise ValueError(f"duplicate data-file basename {base!r}")
        out[base] = rel
    return out


def _removes(snap: _Snapshot, rels: list[str], data_change: bool) -> list[dict]:
    now = _now_ms()
    return [
        {
            "remove": {
                "path": rel,
                "deletionTimestamp": now,
                "dataChange": data_change,
                "partitionValues": snap.files[rel].get("partitionValues", {}),
            }
        }
        for rel in sorted(rels)
    ]


def _cdf_enabled(snap: _Snapshot) -> bool:
    cfg = (snap.metadata_action or {}).get("configuration") or {}
    return cfg.get("delta.enableChangeDataFeed") == "true"


def _stage_cdc_files(
    change_df: DataFrame, table_path: str, partition_by: list[str]
) -> list[dict]:
    """Stage CHANGE DATA files (PROTOCOL.md §Change Data Files) under
    ``_change_data/`` and return the commit's ``cdc`` actions.
    ``change_df`` carries the table columns plus ``_change_type``;
    files partition like data files (values in the action, not the
    file). ``dataChange: false`` per spec — cdc rows are descriptive,
    a snapshot reader never scans them. Cost ∝ changed rows (the
    frames the DML paths already computed), one extra write job per
    CDF-enabled DML commit."""
    import shutil
    import time as _time  # noqa: F401  (parity with _stage_files)
    import uuid as _uuid

    import pyarrow.parquet as _pq

    scratch = os.path.join(table_path, f".tmp-{_uuid.uuid4().hex}")
    w = change_df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(scratch)
    out: list[dict] = []
    for root, _dirs, files in os.walk(scratch):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            src = os.path.join(root, fn)
            if _pq.ParquetFile(src).metadata.num_rows == 0:
                continue
            rel_dir = os.path.relpath(root, scratch)
            pv: dict[str, str | None] = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, v = seg.partition("=")
                    pv[k] = (
                        None
                        if v == "__HIVE_DEFAULT_PARTITION__"
                        else urllib.parse.unquote(v)
                    )
            new_name = f"cdc-{_uuid.uuid4().hex}.parquet"
            rel_path = (
                os.path.join("_change_data", rel_dir, new_name)
                if rel_dir != "."
                else os.path.join("_change_data", new_name)
            )
            dst = os.path.join(table_path, rel_path)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            out.append(
                {
                    "cdc": {
                        "path": rel_path.replace(os.sep, "/"),
                        "partitionValues": pv,
                        "size": os.path.getsize(dst),
                        "dataChange": False,
                    }
                }
            )
    shutil.rmtree(scratch, ignore_errors=True)
    return out


def _rt_resolve(
    spark: SparkSession,
    path: str,
    snap: _Snapshot,
    mat_id: str | None,
    mat_ver: str | None,
    apply_dvs: bool = True,
    keep_pos: bool = False,
) -> tuple[DataFrame, tuple[str, str]]:
    """Row-tracking resolution core (r12, PROTOCOL.md §Row Tracking):
    a file scan with row id / commit version resolved per row — a
    MATERIALIZED file-stored value wins (when the table configures the
    physical column name), else the add's baseRowId + row position /
    defaultRowCommitVersion (a tiny broadcast map, one row per live
    file; files missing baseRowId resolve NULL). Returns
    (scan, (id_col, ver_col)) — the resolved columns' names (the
    materialized names when configured, internal placeholders
    otherwise). Shared by the rewrite carry (_rt_resolved_scan) and
    the reader (read_delta_rows) so the two sides can never diverge."""
    id_col = mat_id or "__rt_id"
    ver_col = mat_ver or "__rt_ver"
    scan = _scan_with_file(
        spark, path, snap, with_pos=True, apply_dvs=apply_dvs,
        extra_phys_cols=tuple(c for c in (mat_id, mat_ver) if c),
    )
    base_rows = [
        (
            urllib.parse.unquote(p).split("/")[-1],
            a.get("baseRowId"),
            a.get("defaultRowCommitVersion"),
        )
        for p, a in sorted(snap.files.items())
    ]
    id_map = F.broadcast(
        spark.createDataFrame(
            base_rows, f"{_FILE_COL} string, __rtbase long, __rtver long"
        )
    )
    rid = F.col("__rtbase") + F.col(_POS_COL)
    rver = F.col("__rtver")
    if mat_id:
        rid = F.coalesce(F.col(mat_id), rid)
    if mat_ver:
        rver = F.coalesce(F.col(mat_ver), rver)
    scan = (
        scan.join(id_map, on=_FILE_COL, how="left")
        .withColumn(id_col, rid)
        .withColumn(ver_col, rver)
        .drop("__rtbase", "__rtver", *([] if keep_pos else [_POS_COL]))
    )
    return scan, (id_col, ver_col)


def _rt_resolved_scan(
    spark: SparkSession,
    path: str,
    snap: _Snapshot,
    ctx: str,
    apply_dvs: bool = True,
    keep_pos: bool = False,
) -> tuple[DataFrame, tuple[str, str]]:
    """Row-tracked REWRITE scan: _rt_resolve under the table's
    configured materialized column names (required — a rewrite that
    cannot stamp carried ids refuses by name in _rt_materialized_names)
    so rewrites carry the resolved columns verbatim into staged files,
    keeping every surviving row's id stable across CoW/DV DML,
    OPTIMIZE, and REORG. ``apply_dvs=False`` + ``keep_pos=True`` is
    the DV-writer shape: the raw positional scan their marking
    machinery needs, ids resolved the same way."""
    mat_id, mat_ver = _rt_materialized_names(snap, ctx)
    return _rt_resolve(
        spark, path, snap, mat_id, mat_ver,
        apply_dvs=apply_dvs, keep_pos=keep_pos,
    )


def _affected_files(scan: DataFrame, cond: Column) -> list[str]:
    """Basenames of live files containing >=1 row matching ``cond``.
    Distributed scan + distinct on the file column; the driver holds
    only the file LIST (metadata scale, same as the log itself)."""
    return [
        r[_FILE_COL]
        for r in scan.filter(cond).select(_FILE_COL).distinct().collect()
    ]


def delete_delta(spark: SparkSession, path: str, predicate: str) -> int:
    """DELETE FROM table WHERE predicate (SQL-null semantics: only rows
    where the predicate is TRUE are deleted). Returns the new version
    (unchanged if nothing matched — no empty commit)."""
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "DELETE")
    _refuse_unenforced_writer_contracts(
        snap, "copy-on-write DML/OPTIMIZE", emits_removes=True
    )
    # MOR tables work directly (r10): the scan applies live deletion
    # vectors, so a rewrite can never resurrect deleted rows; rewritten
    # files drop their vectors with the remove, untouched files keep
    # theirs
    rt = _row_tracking_active(snap)
    if rt:
        # r12: survivors CARRY their resolved row id + commit version
        # as materialized columns in the rewritten files
        scan, rt_cols = _rt_resolved_scan(spark, path, snap, "DELETE")
    else:
        scan, rt_cols = _scan_with_file(spark, path, snap, apply_dvs=True), ()
    cond = F.expr(predicate)
    affected = _affected_files(scan, cond)
    if not affected:
        return snap.version
    rels = _rel_by_base(snap)
    kept = (
        scan.filter(F.col(_FILE_COL).isin(affected))
        .filter(~F.coalesce(cond, F.lit(False)))
        .drop(_FILE_COL)
    )
    _enforce_row_contracts(snap, kept, "DELETE rewrite")
    adds = _stage_table_files(kept, path, snap, mapping)
    cdc: list[dict] = []
    if _cdf_enabled(snap):
        deleted_rows = (
            scan.filter(F.col(_FILE_COL).isin(affected))
            .filter(F.coalesce(cond, F.lit(False)))
            .drop(_FILE_COL, *rt_cols)
            .withColumn("_change_type", F.lit("delete"))
        )
        cdc = _stage_cdc_mapped(deleted_rows, path, snap, mapping)
    actions = _removes(snap, [rels[b] for b in affected], True) + adds + cdc
    if rt:
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path, snap.version, actions, "DELETE", {"predicate": predicate}
    )


# Legacy protocol version -> implied feature sets: shared constants in
# delta.py (an upgrade to the table-features protocol must carry them
# forward explicitly — the spec's rule).
from sparkstreamingtwitter_presidential_spark.sources.delta import (  # noqa: E402
    _LEGACY_READER_FEATURES,
    _LEGACY_WRITER_FEATURES,
)


def _dv_protocol_upgrade(snap: _Snapshot) -> dict[str, Any] | None:
    """The protocol action (or None if already in force) adding the
    deletionVectors table feature: reader 3 / writer 7 with every
    feature the PREVIOUS protocol implied carried forward explicitly
    (the spec's upgrade rule — dropping an implied feature on upgrade
    would silently lift a contract other clients rely on)."""
    pr = snap.protocol_action or {"minReaderVersion": 1, "minWriterVersion": 2}
    rv, wv = pr.get("minReaderVersion", 1), pr.get("minWriterVersion", 2)
    rfeats = set(pr.get("readerFeatures") or _LEGACY_READER_FEATURES.get(rv, []))
    wfeats = set(pr.get("writerFeatures") or _LEGACY_WRITER_FEATURES.get(wv, []))
    if rv == 3 and wv == 7 and "deletionVectors" in rfeats & wfeats:
        return None
    rfeats.add("deletionVectors")
    wfeats.add("deletionVectors")
    return {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": sorted(rfeats),
        "writerFeatures": sorted(wfeats),
    }


# Matched-row budget for a DV delete: positions collect driver-side
# (the descriptor bitmaps are driver-written metadata), so the matched
# set must stay metadata-sized. Matches delta._DV_PAIRS_DRIVER_MAX so
# a table this writer produces always reads back under read_delta's
# pair budget. Bigger deletes belong to copy-on-write delete_delta,
# whose cost is ∝ affected-file bytes but whose driver state is only
# the file list.
_DV_DELETE_MAX_ROWS = 2_000_000


def delete_delta_dv(
    spark: SparkSession,
    path: str,
    predicate: str,
    max_deleted_rows: int = _DV_DELETE_MAX_ROWS,
) -> int:
    """DELETE FROM table WHERE predicate — MERGE-ON-READ flavor: marks
    matched rows in per-file DELETION VECTORS instead of rewriting the
    data files (the write side of the r9 DV read path; Delta
    PROTOCOL.md §Deletion Vectors). Returns the new version (unchanged
    if nothing matched).

    Mechanics: one distributed scan finds matched (file, row_index)
    pairs; they collect driver-side (bounded by ``max_deleted_rows`` —
    refuse above, pointing at copy-on-write :func:`delete_delta`), are
    unioned with each file's EXISTING vector (the spec: a new DV
    replaces the old and must contain it), and serialize into ONE
    roaring-bitmap sidecar per commit (delta_dv.pack_dv_file). A file
    whose union covers every physical row emits a plain remove instead
    of a 100%-deleted DV, matching the real writer. The commit
    re-adds each surviving file unchanged except for the descriptor
    and ``stats.tightBounds: false`` (min/max stay valid SUPERSETS for
    file skipping — they may overcount deleted rows, never miss live
    ones). First DV on a table upgrades the protocol to reader 3 /
    writer 7 in the same commit, carrying implied legacy features
    forward (_dv_protocol_upgrade).

    Scale: the scan is predicate-filtered and projects only metadata
    columns; write cost is ∝ matched rows (bitmap bytes), NOT affected
    -file bytes — the point of DVs. Read-back applies the vectors via
    read_delta's broadcast anti-join. Name-mode column-mapped tables
    work (r10 — DVs key on positions, untouched files keep their
    physical names; only the cdc staging renames); id-mode refuses
    (_write_mapping); appendOnly tables refuse (a DV is a delete)."""
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "delete_delta_dv")
    _refuse_unenforced_writer_contracts(
        snap, "delete_delta_dv", emits_removes=True
    )
    # row-tracked tables work as-is (r12-late): a DV delete never
    # moves a row — the re-added action carries baseRowId/
    # defaultRowCommitVersion verbatim, so surviving ids are stable
    cond = F.expr(predicate)
    scan = _scan_with_file(spark, path, snap, with_pos=True)
    mark = _dv_mark_matched(
        path, snap, scan, cond, max_deleted_rows, "delete"
    )
    if mark is None:
        return snap.version
    actions, fresh_pairs = mark
    if _cdf_enabled(snap) and fresh_pairs:
        # CDF on a DV delete: the newly-deleted rows (never the ones a
        # previous vector already covered) materialize as cdc 'delete'
        # rows — the driver-built pair set is already budget-bounded
        deleted_rows = (
            scan.join(
                _pairs_frame(spark, fresh_pairs),
                on=[_FILE_COL, _POS_COL],
                how="leftsemi",
            )
            .drop(_FILE_COL, _POS_COL)
            .withColumn("_change_type", F.lit("delete"))
        )
        actions.extend(
            _stage_cdc_mapped(deleted_rows, path, snap, mapping)
        )
    return commit_actions(
        path,
        snap.version,
        actions,
        "DELETE",
        {"predicate": predicate, "mode": "deletion-vectors"},
    )


def _pairs_frame(spark: SparkSession, pairs: list) -> DataFrame:
    return F.broadcast(
        spark.createDataFrame(pairs, f"{_FILE_COL} string, {_POS_COL} long")
    )


def _dv_mark_matched(
    path: str,
    snap: _Snapshot,
    scan: DataFrame,
    cond,
    budget: int,
    op: str,
) -> tuple[list[dict], list[tuple[str, int]]] | None:
    """Shared DV-marking machinery (delete_delta_dv / update_delta_dv):
    collect matched (file, row_index) pairs driver-side (bounded by
    ``budget``), union each touched file's set with its EXISTING
    vector (spec: a new DV must contain the old), and build the commit
    actions — protocol upgrade if needed, plain removes for fully-
    deleted files, remove+re-add with the packed descriptor otherwise.
    Returns (actions, fresh_pairs) where fresh_pairs are the NEWLY
    marked (file basename, row_index) rows (never ones a previous
    vector already covered), or None when nothing new matched."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.delta_dv import (
        dv_row_indexes,
        pack_dv_file,
    )

    matched = (
        scan.filter(cond)
        .select(_FILE_COL, _POS_COL)
        .limit(budget + 1)
        .collect()
    )
    if len(matched) > budget:
        raise NotImplementedError(
            f"DV {op} matched more than {budget} rows; descriptors are "
            "driver-built metadata and a change this size should "
            "rewrite data files — use the copy-on-write path"
        )
    if not matched:
        return None
    rels = _rel_by_base(snap)
    by_rel: dict[str, set[int]] = {}
    for r in matched:
        by_rel.setdefault(rels[r[_FILE_COL]], set()).add(int(r[_POS_COL]))

    new_rows_per_rel: dict[str, list[int]] = {}
    fully_deleted: list[str] = []
    fresh_pairs: list[tuple[str, int]] = []  # (file basename, row_index)
    for rel, poss in by_rel.items():
        add = snap.files[rel]
        old_dv = add.get("deletionVector")
        old = set(dv_row_indexes(path, old_dv)) if old_dv else set()
        union = sorted(old | poss)
        if len(union) == len(old):
            continue  # every match was already deleted — no-op file
        base = urllib.parse.unquote(rel).split("/")[-1]
        fresh_pairs.extend((base, p) for p in sorted(poss - old))
        stats = add.get("stats")
        n_phys = _json.loads(stats).get("numRecords") if stats else None
        if n_phys is not None and len(union) == int(n_phys):
            fully_deleted.append(rel)
        else:
            new_rows_per_rel[rel] = union
    if not new_rows_per_rel and not fully_deleted:
        return None

    actions: list[dict[str, Any]] = []
    upgrade = _dv_protocol_upgrade(snap)
    if upgrade is not None and new_rows_per_rel:
        actions.append({"protocol": upgrade})
    actions.extend(
        _removes(snap, fully_deleted + sorted(new_rows_per_rel), True)
    )
    descs = (
        pack_dv_file(path, new_rows_per_rel) if new_rows_per_rel else {}
    )
    for rel in sorted(new_rows_per_rel):
        a = dict(snap.files[rel])
        a["deletionVector"] = descs[rel]
        a["dataChange"] = True
        a["modificationTime"] = _now_ms()
        if a.get("stats"):
            st = _json.loads(a["stats"])
            st["tightBounds"] = False
            a["stats"] = _json.dumps(st)
        actions.append({"add": a})
    return actions, fresh_pairs


def update_delta_dv(
    spark: SparkSession,
    path: str,
    set_exprs: dict[str, str],
    predicate: str | None = None,
    max_updated_rows: int = _DV_DELETE_MAX_ROWS,
) -> int:
    """UPDATE ... SET — MERGE-ON-READ flavor (how the real writer runs
    UPDATE/MERGE on DV-enabled tables): ONE commit marks the matched
    rows deleted in per-file deletion vectors AND stages their updated
    versions as new data files. No matched file is rewritten; write
    cost ∝ matched rows (bitmap bytes + the new rows' bytes), not
    affected-file bytes.

    Rows a PREVIOUS vector already deleted are invisible and are NOT
    updated (resurrecting them as fresh rows would be wrong) — the
    update set is exactly the newly-marked rows. Expressions evaluate
    against the PRE-update row (SQL UPDATE semantics); partition
    columns cannot be updated (same contract as the CoW path). With
    CDF enabled the commit stages update pre/post images. Budget and
    refusal story match delete_delta_dv."""
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "update_delta_dv")
    _refuse_unenforced_writer_contracts(
        snap, "update_delta_dv", emits_removes=True
    )
    bad = set(set_exprs) & set(snap.partition_columns)
    if bad:
        raise ValueError(
            f"cannot UPDATE partition column(s) {sorted(bad)}; "
            "delete+insert (or merge) instead"
        )
    schema = snap.schema
    assert schema is not None
    unknown = set(set_exprs) - {f.name for f in schema.fields}
    if unknown:
        raise ValueError(f"unknown column(s) in SET: {sorted(unknown)}")
    gen_targets = set(set_exprs) & {c for c, _ in _generated_exprs(schema)}
    if gen_targets:
        raise ValueError(
            f"cannot UPDATE generated column(s) {sorted(gen_targets)}; "
            "they recompute from their generation expressions when "
            "their source columns change"
        )
    cond = F.expr(predicate) if predicate is not None else F.lit(True)
    rt = _row_tracking_active(snap)
    if rt:
        # r12-late: the marking scan resolves row ids in place, so the
        # re-staged updated rows CARRY identity (materialized _row_id;
        # the commit version derives from the new add's default)
        scan, (mat_id, _mat_ver) = _rt_resolved_scan(
            spark, path, snap, "UPDATE (deletion-vectors)",
            apply_dvs=False, keep_pos=True,
        )
    else:
        scan = _scan_with_file(spark, path, snap, with_pos=True)
    mark = _dv_mark_matched(
        path, snap, scan, cond, max_updated_rows, "update"
    )
    if mark is None:
        return snap.version
    actions, fresh_pairs = mark
    fresh = scan.join(
        _pairs_frame(spark, fresh_pairs),
        on=[_FILE_COL, _POS_COL],
        how="leftsemi",
    ).drop(_FILE_COL, _POS_COL)
    updated = fresh.select(
        *[
            (
                F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
                if f.name in set_exprs
                else F.col(f.name)
            )
            for f in schema.fields
        ],
        *([F.col(mat_id)] if rt else []),
    )
    updated = _recompute_generated(
        snap, updated, "UPDATE (deletion-vectors)"
    )
    _enforce_row_contracts(snap, updated, "UPDATE (deletion-vectors)")
    actions.extend(_stage_table_files(updated, path, snap, mapping))
    if _cdf_enabled(snap):
        pre = (fresh.drop(mat_id, _mat_ver) if rt else fresh).withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = (updated.drop(mat_id) if rt else updated).withColumn(
            "_change_type", F.lit("update_postimage")
        )
        actions.extend(
            _stage_cdc_mapped(pre.unionByName(post), path, snap, mapping)
        )
    if rt:
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path,
        snap.version,
        actions,
        "UPDATE",
        {"predicate": predicate or "true", "mode": "deletion-vectors"},
    )


def merge_delta_dv(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
    insert_not_matched: bool = True,
    txn: tuple[str, int] | None = None,
    max_matched_rows: int = _DV_DELETE_MAX_ROWS,
) -> int:
    """MERGE INTO — MERGE-ON-READ flavor (the real writer's MERGE on
    DV-enabled tables, and the common CDC-upsert shape): ONE commit
    marks the matched target rows deleted in per-file deletion
    vectors, stages the source's versions of those keys
    (``when_matched='update'``; ``'delete'`` stages nothing), and
    appends the unmatched source rows (``insert_not_matched``). No
    matched file rewrites — write cost ∝ matched rows + source bytes,
    not affected-file bytes, which is what makes a small CDC batch
    against a huge table cheap.

    Contract matches :func:`merge_delta`: source columns must equal
    the table's, duplicate source keys raise, ``txn`` records the
    idempotence marker in the same commit. Matched-row positions
    collect driver-side under ``max_matched_rows`` (refuse → CoW
    merge_delta). Rows a previous vector already deleted are invisible
    — a source row matching only dead rows inserts (if enabled) rather
    than updating them. With CDF enabled the commit stages
    pre/post/insert (or delete) change rows."""
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"when_matched must be update|delete: {when_matched!r}"
        )
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "merge_delta_dv")
    _refuse_unenforced_writer_contracts(
        snap, "merge_delta_dv", emits_removes=True
    )
    schema = snap.schema
    assert schema is not None
    tcols = [f.name for f in schema.fields]
    if sorted(source.columns) != sorted(tcols):
        raise ValueError(
            f"source columns {sorted(source.columns)} != table's "
            f"{sorted(tcols)}"
        )
    missing = [k for k in keys if k not in tcols]
    if missing:
        raise ValueError(f"merge keys not in table: {missing}")
    dup = source.groupBy(*keys).count().filter("count > 1").limit(1).collect()
    if dup:
        raise ValueError(
            f"source has duplicate merge keys (e.g. "
            f"{ {k: dup[0][k] for k in keys} }); MERGE would be ambiguous"
        )
    source = source.select(*tcols)

    rt = _row_tracking_active(snap)
    if rt:
        # r12-late: resolve row ids on the marking scan so re-staged
        # matched rows CARRY identity (materialized _row_id; commit
        # version derives from the new add's default)
        scan, (mat_id, _mat_ver) = _rt_resolved_scan(
            spark, path, snap, "MERGE (deletion-vectors)",
            apply_dvs=False, keep_pos=True,
        )
    else:
        scan = _scan_with_file(spark, path, snap, with_pos=True)
    key_df = source.select(*keys).distinct()
    # the LIVE matched rows: raw-scan matches minus rows an existing
    # vector already deleted (handled inside _dv_mark_matched's
    # fresh-pair computation; the semi-join here is the raw match)
    cond_scan = scan.join(key_df, on=keys, how="leftsemi")
    mark = _dv_mark_matched(
        path,
        snap,
        cond_scan,
        F.lit(True),
        max_matched_rows,
        "merge",
    )
    actions: list[dict[str, Any]] = []
    fresh_pairs: list[tuple[str, int]] = []
    if mark is not None:
        actions, fresh_pairs = mark
    cdc_frames: list[DataFrame] = []
    emit_cdf = _cdf_enabled(snap)
    matched_keys = None
    if fresh_pairs:
        fresh_rows = scan.join(
            _pairs_frame(spark, fresh_pairs),
            on=[_FILE_COL, _POS_COL],
            how="leftsemi",
        ).drop(_FILE_COL, _POS_COL)
        matched_keys = fresh_rows.select(*keys).distinct()
        if when_matched == "update":
            # one updated row PER MATCHED TARGET ROW (duplicate target
            # keys each update — the CoW merge's semantics), hence the
            # inner join on the matched rows' keys, not a semi-join
            updated = fresh_rows.select(
                *keys, *([F.col(mat_id)] if rt else [])
            ).join(source, on=keys, how="inner").select(
                *tcols, *([F.col(mat_id)] if rt else [])
            )
            updated = _recompute_generated(
                snap, updated, "MERGE (deletion-vectors) update"
            )
            _enforce_row_contracts(
                snap, updated, "MERGE (deletion-vectors) update"
            )
            actions.extend(
                _stage_table_files(updated, path, snap, mapping)
            )
            if emit_cdf:
                cdc_frames.append(
                    (fresh_rows.drop(mat_id, _mat_ver) if rt else fresh_rows)
                    .withColumn("_change_type", F.lit("update_preimage"))
                )
                cdc_frames.append(
                    (updated.drop(mat_id) if rt else updated).withColumn(
                        "_change_type", F.lit("update_postimage")
                    )
                )
        elif emit_cdf:
            cdc_frames.append(
                (fresh_rows.drop(mat_id, _mat_ver) if rt else fresh_rows)
                .withColumn("_change_type", F.lit("delete"))
            )
    if insert_not_matched:
        inserts = source
        if matched_keys is not None:
            inserts = source.join(matched_keys, on=keys, how="leftanti")
        # VALIDATE (not recompute) provided generated values on insert
        # — the r11 advice fix, same rationale as merge_delta's branch
        _enforce_row_contracts(
            snap, inserts, "MERGE (deletion-vectors) insert"
        )
        actions.extend(
            _stage_table_files(inserts, path, snap, mapping)
        )
        if emit_cdf:
            cdc_frames.append(
                inserts.withColumn("_change_type", F.lit("insert"))
            )
    if cdc_frames:
        from functools import reduce as _reduce

        actions.extend(
            _stage_cdc_mapped(
                _reduce(DataFrame.unionByName, cdc_frames),
                path,
                snap,
                mapping,
            )
        )
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": txn[0],
                    "version": int(txn[1]),
                    "lastUpdated": _now_ms(),
                }
            }
        )
    if not actions:
        return snap.version
    if rt and any("add" in a for a in actions):
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path,
        snap.version,
        actions,
        "MERGE",
        {
            "keys": keys,
            "whenMatched": when_matched,
            "insertNotMatched": insert_not_matched,
            "mode": "deletion-vectors",
        },
    )


def update_delta(
    spark: SparkSession,
    path: str,
    set_exprs: dict[str, str],
    predicate: str | None = None,
) -> int:
    """UPDATE table SET col = expr, ... [WHERE predicate]. Expressions
    are SQL over the row's own columns (evaluated against the PRE-update
    row, like SQL UPDATE). Partition columns cannot be updated (a real
    row-move rewrite is MERGE's job). Returns the new version."""
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "UPDATE")
    _refuse_unenforced_writer_contracts(
        snap, "copy-on-write DML/OPTIMIZE", emits_removes=True
    )
    bad = set(set_exprs) & set(snap.partition_columns)
    if bad:
        raise ValueError(
            f"cannot UPDATE partition column(s) {sorted(bad)}; "
            "delete+insert (or merge) instead"
        )
    schema = snap.schema
    assert schema is not None
    unknown = set(set_exprs) - {f.name for f in schema.fields}
    if unknown:
        raise ValueError(f"unknown column(s) in SET: {sorted(unknown)}")
    gen_targets = set(set_exprs) & {c for c, _ in _generated_exprs(schema)}
    if gen_targets:
        raise ValueError(
            f"cannot UPDATE generated column(s) {sorted(gen_targets)}; "
            "they recompute from their generation expressions when "
            "their source columns change"
        )
    rt = _row_tracking_active(snap)
    if rt:
        scan, (mat_id, mat_ver) = _rt_resolved_scan(
            spark, path, snap, "UPDATE"
        )
    else:
        scan = _scan_with_file(spark, path, snap, apply_dvs=True)
    cond = F.expr(predicate) if predicate is not None else F.lit(True)
    affected = _affected_files(scan, cond)
    if not affected:
        return snap.version
    rels = _rel_by_base(snap)
    hit = F.coalesce(cond, F.lit(False))
    rewritten = scan.filter(F.col(_FILE_COL).isin(affected)).select(
        *[
            (
                F.when(hit, F.expr(set_exprs[f.name]).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
                if f.name in set_exprs
                else F.col(f.name)
            )
            for f in schema.fields
        ],
        # r12 row tracking: every rewritten row keeps its id; HIT rows
        # null their materialized commit version so the add's
        # defaultRowCommitVersion (this commit) applies on read, while
        # copied rows keep their original attribution
        *(
            [
                F.col(mat_id),
                F.when(hit, F.lit(None).cast("long"))
                .otherwise(F.col(mat_ver))
                .alias(mat_ver),
            ]
            if rt
            else []
        ),
    )
    rewritten = _recompute_generated(snap, rewritten, "UPDATE rewrite")
    _enforce_row_contracts(snap, rewritten, "UPDATE rewrite")
    adds = _stage_table_files(rewritten, path, snap, mapping)
    cdc: list[dict] = []
    if _cdf_enabled(snap):
        matched = scan.filter(F.col(_FILE_COL).isin(affected)).filter(hit)
        if rt:
            matched = matched.drop(mat_id, mat_ver)
        pre = matched.drop(_FILE_COL).withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = _recompute_generated(
            snap,
            matched.select(
                *[
                    (
                        F.expr(set_exprs[f.name])
                        .cast(f.dataType)
                        .alias(f.name)
                        if f.name in set_exprs
                        else F.col(f.name)
                    )
                    for f in schema.fields
                ]
            ),
            "UPDATE cdc",
        ).withColumn("_change_type", F.lit("update_postimage"))
        cdc = _stage_cdc_mapped(pre.unionByName(post), path, snap, mapping)
    actions = _removes(snap, [rels[b] for b in affected], True) + adds + cdc
    if rt:
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path,
        snap.version,
        actions,
        "UPDATE",
        {"predicate": predicate or "true"},
    )


def merge_delta(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
    insert_not_matched: bool = True,
    txn: tuple[str, int] | None = None,
) -> int:
    """MERGE INTO table USING source ON equality of ``keys``.

    ``when_matched``: 'update' (matched target rows take the source
    row's values — full-row upsert), 'delete' (matched rows removed), or
    'none'. ``insert_not_matched``: source rows matching no target row
    are appended. Source must be duplicate-free on the keys (a target
    row matching two source rows is ambiguous — raises, same as the
    real MERGE). Returns the new version.

    ``txn``: optional ``(app_id, version)`` recorded as a protocol
    `txn` action IN THE SAME COMMIT as the merge — the idempotence
    marker a streaming upsert sink pairs with ``last_txn_version`` so
    a redelivered micro-batch is skipped instead of re-merged
    (streaming/delta_upsert.py). A no-op merge with ``txn`` set still
    commits (marker-only), so redelivery detection stays monotone.

    Scale shape: the match probe is one distributed join of the target
    scan against the (usually far smaller, auto-broadcast) source keys;
    only files containing matches rewrite; inserts append. A
    partition-aligned key makes the probe partition-pruned."""
    if when_matched not in ("update", "delete", "none"):
        raise ValueError(f"when_matched must be update|delete|none: {when_matched!r}")
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "MERGE")
    _refuse_unenforced_writer_contracts(
        snap, "copy-on-write DML/OPTIMIZE", emits_removes=True
    )
    schema = snap.schema
    assert schema is not None
    tcols = [f.name for f in schema.fields]
    if sorted(source.columns) != sorted(tcols):
        raise ValueError(
            f"source columns {sorted(source.columns)} != table's {sorted(tcols)}"
        )
    missing = [k for k in keys if k not in tcols]
    if missing:
        raise ValueError(f"merge keys not in table: {missing}")

    dup = source.groupBy(*keys).count().filter("count > 1").limit(1).collect()
    if dup:
        raise ValueError(
            f"source has duplicate merge keys (e.g. "
            f"{ {k: dup[0][k] for k in keys} }); MERGE would be ambiguous"
        )
    source = source.select(*tcols)  # column order for unionByName/insert

    rt = _row_tracking_active(snap)
    if rt:
        scan, (mat_id, mat_ver) = _rt_resolved_scan(
            spark, path, snap, "MERGE"
        )
    else:
        scan = _scan_with_file(spark, path, snap, apply_dvs=True)
    key_df = source.select(*keys).distinct()
    affected = [
        r[_FILE_COL]
        for r in scan.join(key_df, on=keys, how="leftsemi")
        .select(_FILE_COL)
        .distinct()
        .collect()
    ]
    rels = _rel_by_base(snap)

    actions: list[dict[str, Any]] = []
    matched_keys = None
    cdc_frames: list[DataFrame] = []
    emit_cdf = _cdf_enabled(snap)
    if affected:
        hit_rows = scan.filter(F.col(_FILE_COL).isin(affected))
        src = source.select(
            *[F.col(c).alias(f"__src_{c}") for c in tcols]
        ).withColumn("__matched", F.lit(True))
        joined = hit_rows.join(
            src,
            on=[hit_rows[k] == src[f"__src_{k}"] for k in keys],
            how="left",
        )
        m = F.coalesce(F.col("__matched"), F.lit(False))
        # r12 row tracking: rewritten rows keep their resolved id (an
        # upsert changes values, not identity); MATCHED rows null
        # their materialized commit version (the add's default — this
        # commit — applies on read), copied rows keep theirs. Inserts
        # below stage without the columns and mint fresh ids.
        rt_carry = (
            [
                hit_rows[mat_id],
                F.when(m, F.lit(None).cast("long"))
                .otherwise(hit_rows[mat_ver])
                .alias(mat_ver),
            ]
            if rt
            else []
        )
        rt_keep = (
            [hit_rows[mat_id], hit_rows[mat_ver]] if rt else []
        )
        if when_matched == "update":
            rewritten = joined.select(
                *[
                    F.when(m, F.col(f"__src_{c}"))
                    .otherwise(hit_rows[c])
                    .alias(c)
                    for c in tcols
                ],
                *rt_carry,
            )
            if emit_cdf:
                matched_rows = joined.filter(m)
                cdc_frames.append(
                    matched_rows.select(
                        *[hit_rows[c] for c in tcols]
                    ).withColumn("_change_type", F.lit("update_preimage"))
                )
                cdc_frames.append(
                    _recompute_generated(
                        snap,
                        matched_rows.select(
                            *[F.col(f"__src_{c}").alias(c) for c in tcols]
                        ),
                        "MERGE cdc",
                    ).withColumn("_change_type", F.lit("update_postimage"))
                )
        elif when_matched == "delete":
            rewritten = joined.filter(~m).select(
                *[hit_rows[c] for c in tcols], *rt_keep
            )
            if emit_cdf:
                cdc_frames.append(
                    joined.filter(m)
                    .select(*[hit_rows[c] for c in tcols])
                    .withColumn("_change_type", F.lit("delete"))
                )
        else:  # 'none': matched rows keep their current values
            rewritten = joined.select(
                *[hit_rows[c] for c in tcols], *rt_keep
            )
        actions += _removes(snap, [rels[b] for b in affected], True)
        rewritten = _recompute_generated(snap, rewritten, "MERGE rewrite")
        _enforce_row_contracts(snap, rewritten, "MERGE rewrite")
        actions += _stage_table_files(rewritten, path, snap, mapping)
        matched_keys = (
            scan.filter(F.col(_FILE_COL).isin(affected)).select(*keys).distinct()
        )

    if insert_not_matched:
        inserts = source
        if matched_keys is not None:
            inserts = source.join(matched_keys, on=keys, how="leftanti")
        # (no affected files -> no key matched -> every source row inserts)
        # INSERT branch VALIDATES provided generated-column values (the
        # `col <=> (expr)` probe inside _enforce_row_contracts) rather
        # than recomputing them (r11 advice): the real writer rejects a
        # wrong provided value on insert — recompute is reserved for
        # update/rewrite branches where source columns legitimately
        # changed under the row.
        _enforce_row_contracts(snap, inserts, "MERGE insert")
        actions += _stage_table_files(inserts, path, snap, mapping)
        if emit_cdf:
            cdc_frames.append(
                inserts.withColumn("_change_type", F.lit("insert"))
            )
    if cdc_frames:
        from functools import reduce as _reduce

        actions += _stage_cdc_mapped(
            _reduce(DataFrame.unionByName, cdc_frames),
            path,
            snap,
            mapping,
        )

    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": txn[0],
                    "version": int(txn[1]),
                    "lastUpdated": _now_ms(),
                }
            }
        )
    if not actions:
        return snap.version
    if rt and any("add" in a for a in actions):
        # r12 row tracking: fresh id ranges for the staged adds
        # (rewrites' materialized carries ride inside the files)
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path,
        snap.version,
        actions,
        "MERGE",
        {"keys": keys, "whenMatched": when_matched,
         "insertNotMatched": insert_not_matched},
    )


def vacuum_delta(
    path: str,
    retention_hours: float = 168.0,
    now_ms: int | None = None,
) -> list[str]:
    """Physically delete data files tombstoned longer ago than the
    retention window, plus UNTRACKED parquet (never referenced by any
    log action — conflict losers, crashed writers) older than the same
    window, matching the real VACUUM's "not referenced by the table"
    rule. Returns the relative paths deleted.

    Scans the log's JSON commits for ``remove`` actions, drops any path
    that is live in the CURRENT snapshot (a path can be re-added), and
    unlinks files whose ``deletionTimestamp`` is older than
    ``now - retention``. Consequences match the real VACUUM: time travel
    to versions that referenced the deleted files stops working (the
    log still replays — the scan fails), and the default 7-day window
    exists so concurrent readers of recent snapshots don't lose files
    under them. Metadata-only: no Spark job, O(#commits) driver work.
    ``now_ms`` is injectable for deterministic tests."""
    now = _now_ms() if now_ms is None else now_ms
    cutoff = now - int(retention_hours * 3600 * 1000)
    # vacuum deals purely in PATHS — safe on column-mapped tables AND
    # (r9 late) on DV tables: the untracked sweep below only targets
    # *.parquet, so deletion_vector_*.bin sidecars are never
    # reclaimed (live ones keep serving; ones orphaned by replaced
    # vectors persist — a documented conservative boundary, since an
    # old sidecar may still serve TIME TRAVEL within retention and
    # nothing tracks its replacement instant), and a DV rewrite's
    # remove+re-add of the SAME path is protected by the
    # `rel in snap.files` guard on the tombstone pass.
    snap = _replay_log(path, None)
    log_dir = os.path.join(path, "_delta_log")

    import json

    tombstones: dict[str, int] = {}
    for n in sorted(os.listdir(log_dir)):
        if not (n.endswith(".json") and n[:-5].isdigit()):
            continue
        with open(os.path.join(log_dir, n)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "remove" in action:
                    r = action["remove"]
                    tombstones[r["path"]] = max(
                        tombstones.get(r["path"], 0),
                        int(r.get("deletionTimestamp", 0)),
                    )
    # fold in tombstones the snapshot replay carried from CHECKPOINTS
    # (write_checkpoint persists unexpired removes, as the real
    # protocol does): after write_checkpoint + expire_log the JSON
    # commits holding a recent remove are gone, and without these the
    # file would be misclassified as untracked below — losing the
    # retention guard that protects concurrent readers. Boundary:
    # checkpoints written by this engine since round 8 and by the real
    # client both carry tombstones; a pre-round-8 checkpoint that
    # dropped them should be rewritten (write_checkpoint) before
    # expiring the log.
    for rel, r in snap.tombstones.items():
        tombstones[rel] = max(
            tombstones.get(rel, 0), int(r.get("deletionTimestamp", 0))
        )

    deleted = []
    table_root = os.path.abspath(path) + os.sep
    for rel, ts in sorted(tombstones.items()):
        if rel in snap.files or ts > cutoff:
            continue
        abs_path = os.path.join(path, urllib.parse.unquote(rel))
        if not os.path.abspath(abs_path).startswith(table_root):
            # an absolute path OUTSIDE the table root is a shallow
            # clone's pointer into its SOURCE table (clone_delta) —
            # never this table's storage to reclaim. Matches the real
            # VACUUM's scope: only files under the table directory.
            continue
        try:
            os.remove(abs_path)
            deleted.append(rel)
        except FileNotFoundError:
            deleted.append(rel)  # already gone: idempotent

    # UNTRACKED files: parquet under the table dir that no log action
    # ever referenced — a commit-conflict loser's staged files, or a
    # crashed writer's leftovers (the real VACUUM deletes these too:
    # "not referenced by the table"). Age-guarded by mtime with the
    # same cutoff: a freshly staged file of an IN-FLIGHT commit is
    # indistinguishable from an orphan, so retention is the safety —
    # the same rule as iceberg.remove_orphan_files. Deleting them
    # breaks nothing: a file absent from every commit is unreachable
    # from every version, including via time travel.
    referenced = {
        os.path.normpath(os.path.join(path, urllib.parse.unquote(r)))
        for r in set(snap.files) | set(tombstones)
    }
    for root, _dirs, names in os.walk(path):
        if "_delta_log" in root.split(os.sep):
            continue
        for n in names:
            if not n.endswith(".parquet"):
                continue
            full = os.path.normpath(os.path.join(root, n))
            if full in referenced:
                continue
            try:
                if os.path.getmtime(full) * 1000 > cutoff:
                    continue
                os.remove(full)
                deleted.append(os.path.relpath(full, path))
            except OSError:
                continue
    return deleted


def zorder_key(
    cols: list[Column],
    mins: list[int],
    maxs: list[int],
    bits: int = 16,
) -> Column:
    """Bit-interleaved Z-order key over integer columns, each first
    min-max normalized into the same ``bits``-wide rank space — without
    normalization a wide column's high bits dominate the interleave and
    the key degenerates to column-major order (the fixture's event_id
    spans 17 bits vs user_id's 11). Pure builtin shift/mask arithmetic;
    the key orders LAYOUT only, so normalization coarseness affects
    clustering quality, never correctness."""
    n = len(cols)
    space = 1 << bits
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = max(int(hi) - int(lo) + 1, 1)
        scaled.append(
            (c.cast("long") - F.lit(int(lo))) * F.lit(space) / F.lit(span)
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s.cast("long"), i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def optimize_delta(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """Compact small files: within each partition, files below the
    target size are read back and rewritten as ~target-sized files
    (``ceil(total/target)`` output files via repartition). Adds and
    removes carry ``dataChange: false`` — the snapshot's ROWS are
    unchanged, only their file layout — so incremental/streaming
    consumers skip the commit and time travel to pre-OPTIMIZE versions
    still resolves. Partitions with fewer than two small files are left
    alone. Returns the new version (unchanged if nothing to compact).

    ``cluster_by``: range-cluster the rewrite on the given columns
    (repartitionByRange + sortWithinPartitions) so each output file
    covers a narrow, near-disjoint value range — that is what makes the
    per-file min/max `stats` selective, turning `read_delta`'s
    skip_ranges into real file pruning (the OPTIMIZE-then-cluster
    workflow of the real client). Linear ordering: the FIRST column
    prunes sharply; later columns barely at all.

    ``zorder_by`` (mutually exclusive): cluster on the bit-interleaved
    Z-order key of the given integer columns instead — every listed
    column's min/max stats stay selective, so ``skip_ranges`` on ANY of
    them prunes (the real client's multi-column story). Costs one extra
    min/max aggregate over the compacted files to normalize the
    interleave; per-column pruning is coarser than a dedicated linear
    cluster on that column — the classic Z-order trade."""
    import math

    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "OPTIMIZE")
    _refuse_unenforced_writer_contracts(
        snap, "copy-on-write DML/OPTIMIZE", emits_removes=True
    )
    for arg_name, arg in (("cluster_by", cluster_by), ("zorder_by", zorder_by)):
        if not arg:
            continue
        assert snap.schema is not None
        known = {f.name for f in snap.schema.fields}
        unknown = set(arg) - known
        if unknown:
            raise ValueError(f"{arg_name} columns not in schema: {sorted(unknown)}")
        parts_cols = set(arg) & set(snap.partition_columns)
        if parts_cols:
            raise ValueError(
                f"{arg_name} {sorted(parts_cols)} are partition columns — "
                "constant within each compaction group, nothing to cluster"
            )
    groups: dict[tuple, list[str]] = {}
    for rel, a in snap.files.items():
        if int(a.get("size", 0)) >= target_file_bytes:
            continue
        pv = a.get("partitionValues", {})
        key = tuple(sorted(pv.items()))
        groups.setdefault(key, []).append(rel)

    actions: list[dict[str, Any]] = []
    for _key, rels_small in sorted(groups.items()):
        if len(rels_small) < 2:
            continue
        total = sum(int(snap.files[r].get("size", 0)) for r in rels_small)
        n_out = max(1, math.ceil(total / target_file_bytes))
        schema = snap.schema
        assert schema is not None
        phys = (lambda c: mapping[c]) if mapping else (lambda c: c)
        data_fields = [
            f for f in schema.fields if f.name not in snap.partition_columns
        ]
        data_schema = StructType(
            [
                StructField(phys(f.name), f.dataType, f.nullable)
                for f in data_fields
            ]
        )
        part_types = {
            f.name: f.dataType
            for f in schema.fields
            if f.name in snap.partition_columns
        }
        rt = _row_tracking_active(snap)
        if rt:
            # r12 row tracking: a layout-only rewrite must keep BOTH
            # row id and commit version for every copied row — read
            # through the resolving scan and carry the materialized
            # columns into the compacted files
            import copy as _copy

            sub = _copy.copy(snap)
            sub.files = {r: snap.files[r] for r in rels_small}
            rt_scan, rt_cols = _rt_resolved_scan(
                spark, path, sub, "OPTIMIZE"
            )
            df = rt_scan.drop(_FILE_COL).select(
                *[f.name for f in data_fields], *rt_cols
            )
        elif any(snap.files[r].get("deletionVector") for r in rels_small):
            # DV-carrying small files compact too (r10): read through
            # the DV-aware scan so the compaction FOLDS their vectors
            # (rows unchanged -> still dataChange:false); the removes
            # below retire the descriptors with the old paths
            import copy as _copy

            sub = _copy.copy(snap)
            sub.files = {r: snap.files[r] for r in rels_small}
            df = _scan_with_file(
                spark, path, sub, apply_dvs=True
            ).drop(_FILE_COL).select(*[f.name for f in data_fields])
        else:
            df = spark.read.schema(data_schema).parquet(
                *sorted(
                    os.path.join(path, urllib.parse.unquote(r))
                    for r in rels_small
                )
            ).select(
                *[F.col(phys(f.name)).alias(f.name) for f in data_fields]
            )
        if cluster_by:
            df = df.repartitionByRange(
                n_out, *[F.col(c) for c in cluster_by]
            ).sortWithinPartitions(*cluster_by)
        elif zorder_by:
            # one extra (column-pruned) pass over just the compacted
            # files to learn each column's range for the interleave
            bounds = df.agg(
                *[F.min(c).alias(f"lo_{c}") for c in zorder_by],
                *[F.max(c).alias(f"hi_{c}") for c in zorder_by],
            ).collect()[0]
            zk = zorder_key(
                [F.col(c) for c in zorder_by],
                [bounds[f"lo_{c}"] for c in zorder_by],
                [bounds[f"hi_{c}"] for c in zorder_by],
            )
            df = (
                df.withColumn("__zk", zk)
                .repartitionByRange(n_out, F.col("__zk"))
                .sortWithinPartitions("__zk")
            )
        else:
            df = df.repartition(n_out)
        pv = dict(_key)
        for col in snap.partition_columns:
            # mapped tables key partitionValues by PHYSICAL name
            val = pv.get(phys(col), pv.get(col))
            df = df.withColumn(col, F.lit(val).cast(part_types[col]))
        adds = _stage_table_files(
            df.select(
                *[f.name for f in schema.fields],
                *(rt_cols if rt else ()),
            ),
            path,
            snap,
            mapping,
        )
        for a in adds:
            a["add"]["dataChange"] = False
        actions += _removes(snap, rels_small, False) + adds

    if not actions:
        return snap.version
    if _row_tracking_active(snap):
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path,
        snap.version,
        actions,
        "OPTIMIZE",
        {"targetFileBytes": target_file_bytes},
    )


def rewrite_deletion_vectors(
    spark: SparkSession, path: str
) -> int:
    """REORG (r10): fold every live deletion vector back into its data
    file — the maintenance op all the DV refusals point at ("compact
    the DVs into data files"), completing the MOR lifecycle this
    engine writes (delete/update/merge via DVs) and reads.

    Mechanics: scan ONLY the DV-carrying files (a restricted snapshot,
    never the table), anti-join each file's decoded row positions, and
    stage the surviving rows as fresh files; ONE commit tombstones the
    DV-carrying files and adds the replacements. ``dataChange: false``
    on both sides — the snapshot's visible ROWS are unchanged, only
    their layout (the real REORG TABLE ... APPLY (PURGE) semantics),
    so streaming/incremental consumers correctly skip the commit and
    time travel still resolves. Files whose vector covers every row
    emit a plain remove. After the commit, copy-on-write DML and
    OPTIMIZE need no fold at all since r10 late (both are DV-aware);
    the replaced deletion_vector_*.bin sidecars become VACUUM-exempt
    orphans until retention (documented conservative boundary — they
    may still serve time travel).

    Scale: decode is driver-side under the pair budget and
    executor-side above it (the read path's split); rewrite cost is
    ∝ DV-carrying file bytes — exactly the files whose read-side
    anti-join tax this op retires. Column-mapped tables work (staging
    goes through the physical-name path)."""
    snap = _replay_log(path, None)
    mapping = _write_mapping(snap, "rewrite_deletion_vectors")
    _refuse_unenforced_writer_contracts(
        snap, "rewrite_deletion_vectors", emits_removes=True
    )
    dv_rels = sorted(
        p for p, a in snap.files.items() if a.get("deletionVector")
    )
    if not dv_rels:
        return snap.version
    # restricted view: scan exactly the DV-carrying files
    import copy as _copy

    sub = _copy.copy(snap)
    sub.files = {p: snap.files[p] for p in dv_rels}
    rt = _row_tracking_active(snap)
    if rt:
        # r12-late: a layout-only fold keeps BOTH row id and commit
        # version for every surviving row (materialized carry)
        scan, _rt_cols = _rt_resolved_scan(
            spark, path, sub, "REORG", apply_dvs=False, keep_pos=True
        )
    else:
        scan = _scan_with_file(spark, path, sub, with_pos=True)

    build = _dv_pairs_by_base(spark, path, snap, dv_rels)
    kept = scan.join(
        build, on=[_FILE_COL, _POS_COL], how="left_anti"
    ).drop(_FILE_COL, _POS_COL)
    adds = _stage_table_files(kept, path, snap, mapping)
    for a in adds:
        a["add"]["dataChange"] = False  # layout-only, like OPTIMIZE
    actions = _removes(snap, dv_rels, False) + adds
    if rt:
        actions = _assign_row_tracking(snap, actions, snap.version + 1)
    return commit_actions(
        path,
        snap.version,
        actions,
        "REORG",
        {"applyPurge": True, "rewrittenFiles": len(dv_rels)},
    )


def read_delta_rows(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read EXPOSING Delta ROW TRACKING (PROTOCOL.md §Row
    Tracking — the Delta twin of Iceberg v3 row lineage): the table
    columns plus ``_row_id`` and ``_row_commit_version``, resolved the
    way the real reader does:

    * a MATERIALIZED value in the data file wins — the physical column
      names come from the table's
      ``delta.rowTracking.materializedRowIdColumnName`` /
      ``materializedRowCommitVersionColumnName`` configuration (what
      writers stamp when rows are copied by DML/OPTIMIZE);
    * else the FRESH value: the add action's ``baseRowId`` plus the
      row's physical position in its file, and
      ``defaultRowCommitVersion`` respectively;
    * files missing ``baseRowId`` (pre-enablement history awaiting
      backfill) read NULL rather than a guessed id.

    Requires the table to declare the ``rowTracking`` writer feature;
    refuses by name otherwise. Reads apply live deletion vectors (a
    DV-deleted row's id is never surfaced). The WRITE side is
    maintained since r12-late across EVERY write path:
    enable_row_tracking backfills and mints the materialized names,
    appends claim fresh ranges (_assign_row_tracking), CoW and DV
    DML/OPTIMIZE/REORG rewrites carry ids as materialized columns
    (_rt_resolved_scan), DV deletes re-add actions verbatim.

    Scale shape: the id map is one tiny broadcast row per live file
    (log metadata); per-row assignment is ``base + _metadata.row_index``
    — no shuffle, no window, no global ordering pass."""
    snap = _replay_log(path, version)
    feats = set((snap.protocol_action or {}).get("writerFeatures") or [])
    cfg = (snap.metadata_action or {}).get("configuration") or {}
    if "rowTracking" not in feats:
        raise NotImplementedError(
            "table does not declare the rowTracking writer feature — "
            "row ids are undefined here; use read_delta"
        )
    scan, (id_col, ver_col) = _rt_resolve(
        spark, path, snap,
        cfg.get("delta.rowTracking.materializedRowIdColumnName"),
        cfg.get("delta.rowTracking.materializedRowCommitVersionColumnName"),
    )
    assert snap.schema is not None
    cols = [f.name for f in snap.schema.fields]
    return scan.select(
        *cols,
        F.col(id_col).alias("_row_id"),
        F.col(ver_col).alias("_row_commit_version"),
    )
