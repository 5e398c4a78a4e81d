r"""Native Avro Object Container File source/sink — the fourth
interchange format (JSONL / CSV / ORC / Avro). Kafka-centric and
schema-registry shops ship Avro the way Hive shops ship ORC; Spark's
own Avro support lives in the external ``spark-avro`` jar, which is
absent from this environment, so — same policy as the native Delta
connector (`sources/delta.py`) — the PUBLIC format spec is implemented
directly rather than stubbed: the Avro 1.11 specification's binary
encoding and object-container framing (magic ``Obj\x01``, metadata map
with ``avro.schema``/``avro.codec``, 16-byte sync marker, deflate ==
raw RFC-1951) — nothing here derives from any jar's internals.

Supported schema subset: records of null / boolean / int / long /
float / double / string / bytes / array-of-those, with nullability as
the standard ``["null", T]`` union — exactly the shapes the engine's
tables use. Anything else raises up front (honest refusal, not silent
coercion).

Scale shape: one container FILE per partition, written by the
executors (shared-filesystem sink contract, like every file sink);
reads parallelize over the file list, one task per file by default,
and ``read_avro(split_bytes=...)`` splits each file into byte-range
tasks at container-BLOCK granularity (Hadoop's sync-scan split rule),
removing the single-huge-file parallelism floor — a lone large
container decodes across the cluster. Per-row Python encode/decode is the
honest cost of a native row format without the jar (there is no Arrow
shortcut for row-oriented Avro); at petabyte scale you deploy
spark-avro and keep this module as the spec-true fallback and test
oracle. RDD mapPartitions is used deliberately: per-partition
imperative IO is the one job DataFrames can't express.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_BLOCK_BYTES = 256 * 1024  # flush threshold per container block

_PRIMITIVES: list[tuple[type, str]] = [
    (BooleanType, "boolean"),
    (IntegerType, "int"),
    (LongType, "long"),
    (FloatType, "float"),
    (DoubleType, "double"),
    (StringType, "string"),
    (BinaryType, "bytes"),
]


# ---------------------------------------------------------------- schema


def _field_avro_type(dt: DataType) -> object:
    for spark_t, avro_t in _PRIMITIVES:
        if isinstance(dt, spark_t):
            return avro_t
    if isinstance(dt, ArrayType):
        item = _field_avro_type(dt.elementType)
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    raise NotImplementedError(
        f"avro source supports null/boolean/int/long/float/double/string/"
        f"bytes/array columns; got {dt.simpleString()}"
    )


def spark_to_avro_schema(schema: StructType, name: str = "row") -> dict:
    """Avro record schema (as a dict) for a Spark StructType."""
    fields = []
    for f in schema.fields:
        t = _field_avro_type(f.dataType)
        if f.nullable:
            t = ["null", t]
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def avro_to_spark_schema(avro: dict) -> StructType:
    """Inverse mapping for reads without a caller-pinned schema."""
    rev = {a: s for s, a in _PRIMITIVES}

    def dt(t: object) -> tuple[DataType, bool]:
        if isinstance(t, list):  # union: only ["null", T] supported
            rest = [x for x in t if x != "null"]
            if len(rest) != 1 or len(rest) == len(t):
                raise NotImplementedError(f"unsupported avro union {t}")
            inner, _ = dt(rest[0])
            return inner, True
        if isinstance(t, dict):
            if t.get("type") == "array":
                item, item_null = dt(t["items"])
                return ArrayType(item, containsNull=item_null), False
            return dt(t["type"])
        if isinstance(t, str) and t in rev:
            return rev[t](), False
        raise NotImplementedError(f"unsupported avro type {t!r}")

    out = StructType()
    for f in avro["fields"]:
        typ, nullable = dt(f["type"])
        out.add(f["name"], typ, nullable)
    return out


# ---------------------------------------------------------------- encoding


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(buf: bytearray, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf += b


def _write_value(buf: bytearray, t: object, v: object) -> None:
    if isinstance(t, list):  # union: null + one branch
        if v is None:
            buf_idx = next(i for i, x in enumerate(t) if x == "null")
            _write_long(buf, buf_idx)
            return
        idx, branch = next(
            (i, x) for i, x in enumerate(t) if x != "null"
        )
        _write_long(buf, idx)
        _write_value(buf, branch, v)
    elif t == "boolean":
        buf.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(buf, int(v))
    elif t == "float":
        buf += struct.pack("<f", v)
    elif t == "double":
        buf += struct.pack("<d", v)
    elif t == "string":
        _write_bytes(buf, v.encode("utf-8"))
    elif t == "bytes":
        _write_bytes(buf, bytes(v))
    elif isinstance(t, dict) and t.get("type") == "array":
        if len(v):
            _write_long(buf, len(v))
            for item in v:
                _write_value(buf, t["items"], item)
        _write_long(buf, 0)
    elif isinstance(t, dict) and t.get("type") == "map":
        # string keys, block-framed like arrays
        if len(v):
            _write_long(buf, len(v))
            for k, mv in v.items():
                _write_bytes(buf, k.encode("utf-8"))
                _write_value(buf, t["values"], mv)
        _write_long(buf, 0)
    elif isinstance(t, dict) and t.get("type") == "record":
        # value addressed by field name: dict or pyspark Row both
        # support __getitem__ by name. A field ABSENT from the value
        # writes null ONLY when its schema type is a nullable union —
        # that lets schema-evolved writers (e.g. the manifest entry
        # gaining equality_ids) re-serialize records read under an
        # older schema, while a typo'd or forgotten key for any
        # REQUIRED field raises instead of silently nulling (r8
        # verdict: the broad except converted loud future bugs into
        # silent ones).
        for fld in t["fields"]:
            try:
                fv = v[fld["name"]]
            except (KeyError, ValueError):
                ft = fld["type"]
                if isinstance(ft, list) and "null" in ft:
                    fv = None
                else:
                    raise KeyError(
                        f"record value is missing required field "
                        f"{fld['name']!r} (only nullable-union fields "
                        "may be absent, the schema-evolution allowance)"
                    ) from None
            _write_value(buf, fld["type"], fv)
    elif isinstance(t, dict) and t.get("type") == "fixed":
        b = bytes(v)
        if len(b) != t["size"]:
            raise ValueError(
                f"fixed({t['size']}) value has {len(b)} bytes"
            )
        buf += b
    else:  # pragma: no cover — schema validated at write entry
        raise NotImplementedError(f"unsupported avro type {t!r}")


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag decode

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def value(self, t: object) -> object:
        if isinstance(t, list):
            idx = self.long()
            branch = t[idx]
            return None if branch == "null" else self.value(branch)
        if t == "boolean":
            return self.raw(1) == b"\x01"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.raw(4))[0]
        if t == "double":
            return struct.unpack("<d", self.raw(8))[0]
        if t == "string":
            return self.bytes_().decode("utf-8")
        if t == "bytes":
            return self.bytes_()
        if isinstance(t, dict) and t.get("type") == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec-legal)
                    n = -n
                    self.long()  # skip the size hint
                for _ in range(n):
                    out.append(self.value(t["items"]))
        if isinstance(t, dict) and t.get("type") == "map":
            m: dict = {}
            while True:
                n = self.long()
                if n == 0:
                    return m
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.bytes_().decode("utf-8")
                    m[k] = self.value(t["values"])
        if isinstance(t, dict) and t.get("type") == "record":
            return {
                fld["name"]: self.value(fld["type"]) for fld in t["fields"]
            }
        if isinstance(t, dict) and t.get("type") == "fixed":
            return self.raw(t["size"])
        raise NotImplementedError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------- container


def _write_header(out: io.BufferedWriter, meta: dict[str, bytes], sync: bytes) -> None:
    buf = bytearray(MAGIC)
    _write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode("utf-8"))
        _write_bytes(buf, v)
    _write_long(buf, 0)
    buf += sync
    out.write(bytes(buf))


def _flush_block(out, buf: bytearray, count: int, codec: str, sync: bytes) -> None:
    if not count:
        return
    data = bytes(buf)
    if codec == "deflate":  # avro deflate == raw RFC-1951 (no zlib header)
        data = zlib.compress(data, 6)[2:-4]
    head = bytearray()
    _write_long(head, count)
    _write_long(head, len(data))
    out.write(bytes(head))
    out.write(data)
    out.write(sync)


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    n_files: int | None = None,
) -> str:
    """Write ``df`` as Avro container files, one per partition, plus
    ``_SUCCESS``. Deterministic layout: the per-file sync marker is
    derived from (path, partition index), so identical input produces
    byte-identical files."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be 'null' or 'deflate', got {codec!r}")
    if n_files is not None:
        df = df.repartition(n_files)
    avro_schema = spark_to_avro_schema(df.schema)  # validates types up front
    schema_json = json.dumps(avro_schema)
    field_types = [f["type"] for f in avro_schema["fields"]]
    n_fields = len(field_types)
    os.makedirs(path, exist_ok=True)

    def write_part(pidx: int, rows):
        first = True
        fname = os.path.join(path, f"part-{pidx:05d}.avro")
        sync = hashlib.md5(f"{path}:{pidx}".encode()).digest()
        out = None
        buf = bytearray()
        count = 0
        for row in rows:
            if first:
                out = open(fname, "wb")
                _write_header(
                    out,
                    {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()},
                    sync,
                )
                first = False
            for i in range(n_fields):
                _write_value(buf, field_types[i], row[i])
            count += 1
            if len(buf) >= _BLOCK_BYTES:
                _flush_block(out, buf, count, codec, sync)
                buf = bytearray()
                count = 0
        if out is not None:
            _flush_block(out, buf, count, codec, sync)
            out.close()
            yield fname

    df.rdd.mapPartitionsWithIndex(write_part).collect()  # force execution
    open(os.path.join(path, "_SUCCESS"), "w").close()
    return path


def _read_header(data: bytes) -> tuple[dict, str, bytes, int]:
    if data[:4] != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            # explicit temporaries: d[k()] = v() evaluates v FIRST
            key = r.bytes_().decode()
            meta[key] = r.bytes_()
    sync = r.raw(SYNC_SIZE)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, r.pos


def _decode_file(fname: str):
    with open(fname, "rb") as f:
        data = f.read()
    schema, codec, sync, pos = _read_header(data)
    field_types = [fld["type"] for fld in schema["fields"]]
    names = [fld["name"] for fld in schema["fields"]]
    r = _Reader(data)
    r.pos = pos
    while r.pos < len(data):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if r.raw(SYNC_SIZE) != sync:
            raise ValueError(f"{fname}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r} not supported")
        br = _Reader(block)
        for _ in range(count):
            yield Row(**{n: br.value(t) for n, t in zip(names, field_types)})


def _decode_split(fname: str, start: int, end: int):
    """Decode the container blocks whose START byte lies in
    [start, end) — the Hadoop split rule: a task seeks to its range,
    sync-scans forward to the first block boundary at-or-after
    ``start``, then reads sequential blocks until one starts at-or-past
    ``end`` (the final claimed block may extend beyond ``end``; the
    next split will skip it because its start is behind that split's
    range). Block boundaries are recognized as a position immediately
    preceded by the file's 16-byte sync marker (or the header end);
    a data byte-string that happens to equal the sync (2^-128 per
    position) is caught by the trailing-sync validation and re-scanned
    past."""
    with open(fname, "rb") as f:
        head = f.read(1 << 20)  # container headers are far below 1 MiB
        schema, codec, sync, header_end = _read_header(head)
        field_types = [fld["type"] for fld in schema["fields"]]
        names = [fld["name"] for fld in schema["fields"]]
        f.seek(0, os.SEEK_END)
        fsize = f.tell()
        end = min(end, fsize)

        if start <= header_end:
            p = header_end
        else:
            # scan for the sync whose END is the first boundary >= start
            scan_from = max(start - SYNC_SIZE, header_end)
            f.seek(scan_from)
            window = f.read(min(end - scan_from + (1 << 20), fsize - scan_from))
            idx = window.find(sync)
            p = None
            while idx != -1:
                cand = scan_from + idx + SYNC_SIZE
                if cand >= start:
                    p = cand
                    break
                idx = window.find(sync, idx + 1)
            if p is None:
                return  # no boundary in range: nothing to claim

        while p is not None and p < end and p < fsize:
            f.seek(p)
            # longest block header: two 10-byte varints
            chunk = f.read(20)
            r = _Reader(chunk)
            try:
                count = r.long()
                size = r.long()
            except IndexError:
                return  # truncated tail
            body_at = p + r.pos
            f.seek(body_at)
            block = f.read(size)
            trailer = f.read(SYNC_SIZE)
            if len(block) != size or trailer != sync:
                # false-positive sync inside data: resume scanning just
                # past the bogus boundary
                f.seek(p)
                window = f.read(min(1 << 20, fsize - p))
                idx = window.find(sync)
                p = p + idx + SYNC_SIZE if idx != -1 else None
                continue
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise NotImplementedError(f"avro codec {codec!r} not supported")
            br = _Reader(block)
            for _ in range(count):
                yield Row(**{n: br.value(t) for n, t in zip(names, field_types)})
            p = body_at + size + SYNC_SIZE


def write_container(
    fname: str,
    avro_schema: dict,
    rows: list,
    meta: dict[str, bytes] | None = None,
    codec: str = "null",
) -> int:
    """Driver-side single-file container write with an ARBITRARY Avro
    record schema (nested records / maps / fixed included) and caller
    metadata keys — the primitive Iceberg manifests are built from
    (manifest files ARE Avro containers whose metadata carries the
    Iceberg schema/spec strings). Rows are dicts keyed by field name.
    Returns the file's byte length (Iceberg manifest lists record it)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be 'null' or 'deflate', got {codec!r}")
    schema_json = json.dumps(avro_schema)
    sync = hashlib.md5(fname.encode()).digest()
    all_meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    all_meta.update(meta or {})
    with open(fname, "wb") as out:
        _write_header(out, all_meta, sync)
        buf = bytearray()
        count = 0
        for row in rows:
            _write_value(buf, avro_schema, row)
            count += 1
            if len(buf) >= _BLOCK_BYTES:
                _flush_block(out, buf, count, codec, sync)
                buf = bytearray()
                count = 0
        _flush_block(out, buf, count, codec, sync)
    return os.path.getsize(fname)


def read_container(fname: str) -> tuple[dict, dict[str, bytes], list]:
    """Driver-side single-file container read: (writer schema, metadata
    map, rows-as-dicts). The inverse of ``write_container``; nested
    records come back as dicts, maps as dicts, fixed as bytes."""
    with open(fname, "rb") as f:
        data = f.read()
    schema, codec, sync, pos = _read_header(data)
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            key = r.bytes_().decode()
            meta[key] = r.bytes_()
    rows = []
    r.pos = pos
    while r.pos < len(data):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if r.raw(SYNC_SIZE) != sync:
            raise ValueError(f"{fname}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r} not supported")
        br = _Reader(block)
        for _ in range(count):
            rows.append(br.value(schema))
    return schema, meta, rows


def read_avro(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    split_bytes: int | None = None,
) -> DataFrame:
    """Parallel Avro read. Default: one task per container file (the
    natural floor for many-file interchange drops). ``split_bytes``
    additionally splits each file into byte-range tasks at container
    BLOCK granularity (the Hadoop split rule — sync-scan to the first
    block at-or-after the range start), removing the single-huge-file
    parallelism floor: a lone 100 GB container decodes across the whole
    cluster instead of one task. Pass ``schema`` to pin reader types
    (interchange rule); otherwise the writer schema embedded in the
    first file's header is mapped back to Spark types."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
    )
    if not files:
        if schema is None:
            raise ValueError(f"{path}: no .avro files and no schema given")
        return spark.createDataFrame([], schema)
    if schema is None:
        with open(files[0], "rb") as fh:
            head = fh.read(1 << 20)
        schema = avro_to_spark_schema(_read_header(head)[0])
    if split_bytes is None:
        rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(
            _decode_file
        )
    else:
        if split_bytes < 1:
            raise ValueError(f"split_bytes must be >= 1, got {split_bytes}")
        splits = []
        for fn in files:
            fsize = os.path.getsize(fn)
            for s in range(0, fsize, split_bytes):
                splits.append((fn, s, min(s + split_bytes, fsize)))
        rdd = spark.sparkContext.parallelize(splits, len(splits)).flatMap(
            lambda t: _decode_split(*t)
        )
    return spark.createDataFrame(rdd, schema)
