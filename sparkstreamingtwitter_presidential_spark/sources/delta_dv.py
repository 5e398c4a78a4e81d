"""Delta Lake deletion vectors: the public serialization stack.

A deletion vector (DV) marks rows of one data file as deleted without
rewriting the file (Delta PROTOCOL.md §Deletion Vectors). The add
action carries a descriptor {storageType, pathOrInlineDv, offset,
sizeInBytes, cardinality}; the vector itself is a RoaringBitmapArray
of 64-bit row indexes, either inline (Z85-encoded in the descriptor)
or in a sidecar ``deletion_vector_<uuid>.bin`` file.

Layers, all public formats:

* Z85 — ZeroMQ RFC 32/Z85 base-85 (4 bytes -> 5 chars), the
  protocol's chosen binary-to-text encoding.
* 32-bit RoaringBitmap portable serialization — the cross-language
  interchange format from the RoaringFormatSpec (array, bitmap and
  run containers; cookies 12346/12347).
* RoaringBitmapArray — Delta's 64-bit extension: magic 1681511377,
  a count, then DENSE 32-bit bitmaps in increasing high-word order
  (row index = high<<32 | low).
* DV file layout — a 1-byte format version (1), then per vector:
  4-byte BIG-endian length, the RoaringBitmapArray bytes, 4-byte
  BIG-endian CRC-32 of those bytes.

The writer half serves the DV-mode DML paths (delta_dml) plus
fixtures; the reader half is the production path used by
``read_delta``. Scale note: descriptors are METADATA; small backlogs
decode driver-side into a broadcast anti-join on (file, row_index) —
the Iceberg position-delete reader's shape — while backlogs above the
driver pair budget decode executor-side into a distributed build
(delta._dv_filter), so the pair set never lands on the driver.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Any, Iterable

# --------------------------------------------------------------- Z85

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: every 4 input bytes (big-endian word) -> 5 chars.
    Input length must be a multiple of 4 (the protocol guarantees it:
    UUIDs are 16 bytes; inline bitmaps are padded by the writer)."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not divisible by 4")
    out = []
    for i in range(0, len(data), 4):
        word = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text length {len(text)} not divisible by 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError("z85 quintet overflows 32 bits")
        out += word.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------- 32-bit RoaringBitmap (portable)

_SERIAL_COOKIE_NO_RUNS = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def roaring32_serialize(values: Iterable[int]) -> bytes:
    """Serialize sorted-unique uint32 values in the portable format.
    Always emits the run-aware cookie (12347) with array/bitmap
    containers (no run encoding — simpler, still spec-valid); offsets
    are included at >= 4 containers per the spec's rule."""
    vals = sorted(set(int(v) for v in values))
    if vals and (vals[0] < 0 or vals[-1] > 0xFFFFFFFF):
        raise ValueError("roaring32 values must be uint32")
    containers: list[tuple[int, list[int]]] = []
    for v in vals:
        key, low = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == key:
            containers[-1][1].append(low)
        else:
            containers.append((key, [low]))
    n = len(containers)
    if n == 0:
        # the reference serializer's empty shape: legacy cookie + size 0
        return struct.pack("<II", _SERIAL_COOKIE_NO_RUNS, 0)
    out = bytearray()
    out += struct.pack("<I", (_SERIAL_COOKIE | ((n - 1) << 16)) & 0xFFFFFFFF)
    out += bytes((n + 7) // 8)  # run-container bitset: none
    for key, lows in containers:
        out += struct.pack("<HH", key, len(lows) - 1)
    bodies = []
    for _key, lows in containers:
        if len(lows) <= _ARRAY_MAX:
            bodies.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            bodies.append(bytes(bits))
    if n >= _NO_OFFSET_THRESHOLD:
        pos = len(out) + 4 * n
        for b in bodies:
            out += struct.pack("<I", pos)
            pos += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def roaring32_deserialize(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``buf[pos:]`` ->
    (sorted values, next position). Handles all three container types
    and both cookies."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        run_bits = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNS:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_bits = bytes((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # sequential read — offsets are redundant
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_bits[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif card <= _ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + lo for lo in lows)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    lsb = byte & -byte
                    values.append(base + (byte_i << 3) + lsb.bit_length() - 1)
                    byte ^= lsb
    return values, pos


# ---------------------------------- RoaringBitmapArray (Delta 64-bit)

_RBA_MAGIC = 1681511377


# Dense high-word ceiling for the WRITE path: the serializer emits an
# (empty) 32-bit bitmap for every high word up to the max row index,
# so a forged/corrupt descriptor with an absurd index would allocate
# proportionally. 1024 high words = a row index past 2^42 (4.4
# trillion rows in ONE parquet file) — far beyond any real file, so
# raising here refuses garbage without constraining real tables. The
# READ path is unaffected (length fields bound parsing).
_RBA_MAX_HIGH_WORDS = 1024


def rba_serialize(row_indexes: Iterable[int]) -> bytes:
    """Delta's portable RoaringBitmapArray: magic, 8-byte count, then
    DENSE 32-bit bitmaps for high words 0..max (empty ones included,
    matching the reference serializer's dense array)."""
    by_high: dict[int, list[int]] = {}
    for ri in row_indexes:
        ri = int(ri)
        if ri < 0:
            raise ValueError("row index must be non-negative")
        by_high.setdefault(ri >> 32, []).append(ri & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    if n > _RBA_MAX_HIGH_WORDS:
        top = (max(by_high) << 32) | max(by_high[max(by_high)])
        raise ValueError(
            f"row index {top} implies {n} dense high-word bitmaps "
            f"(max {_RBA_MAX_HIGH_WORDS}); refusing an implausible "
            "index rather than allocating proportionally"
        )
    out = bytearray()
    out += struct.pack("<I", _RBA_MAGIC)
    out += struct.pack("<q", n)
    for high in range(n):
        out += roaring32_serialize(by_high.get(high, []))
    return bytes(out)


def rba_deserialize(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(
            f"not a RoaringBitmapArray (magic {magic}, want {_RBA_MAGIC})"
        )
    (n,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n):
        vals, pos = roaring32_deserialize(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


# ------------------------------------------------ descriptor handling


def _dv_abs_path(table_path: str, dv: dict[str, Any]) -> str:
    st = dv["storageType"]
    if st == "p":
        return dv["pathOrInlineDv"]
    # "u": <random prefix (optional)><20-char z85 uuid>
    enc = dv["pathOrInlineDv"]
    prefix, tail = enc[:-20], enc[-20:]
    u = _uuid.UUID(bytes=z85_decode(tail))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def dv_row_indexes(table_path: str, dv: dict[str, Any]) -> list[int]:
    """Decode one deletion-vector descriptor -> sorted row indexes.
    Verifies sizeInBytes, the on-disk CRC-32, and the declared
    cardinality — a mismatch raises (refuse over wrong rows)."""
    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])[: int(dv["sizeInBytes"])]
    elif st in ("u", "p"):
        fpath = _dv_abs_path(table_path, dv)
        with open(fpath, "rb") as fh:
            blob = fh.read()
        if not blob or blob[0] != 1:
            raise ValueError(
                f"unsupported DV file format version {blob[:1]!r} in {fpath}"
            )
        off = int(dv["offset"])
        (size,) = struct.unpack_from(">i", blob, off)
        if size != int(dv["sizeInBytes"]):
            raise ValueError(
                f"DV length mismatch in {fpath}: file says {size}, "
                f"descriptor says {dv['sizeInBytes']}"
            )
        data = blob[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch in {fpath}")
    else:
        raise NotImplementedError(f"unknown DV storageType {st!r}")
    out = sorted(rba_deserialize(data))
    if len(out) != int(dv["cardinality"]):
        raise ValueError(
            f"DV cardinality mismatch: decoded {len(out)}, descriptor "
            f"says {dv['cardinality']}"
        )
    return out


def write_dv_file(
    table_path: str, row_indexes: Iterable[int], prefix: str = ""
) -> dict[str, Any]:
    """Fixture/test writer: serialize ``row_indexes`` into an on-disk
    DV file under ``table_path`` and return the descriptor dict for
    the add action (storageType "u")."""
    rows = sorted(set(int(r) for r in row_indexes))
    data = rba_serialize(rows)
    u = _uuid.uuid4()
    target_dir = os.path.join(table_path, prefix) if prefix else table_path
    os.makedirs(target_dir, exist_ok=True)
    fpath = os.path.join(target_dir, f"deletion_vector_{u}.bin")
    with open(fpath, "wb") as fh:
        fh.write(b"\x01")
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(rows),
    }


def pack_dv_file(
    table_path: str, per_key_rows: dict[Any, Iterable[int]], prefix: str = ""
) -> dict[Any, dict[str, Any]]:
    """Production DV writer (delete_delta_dv): serialize EVERY key's
    row-index set into ONE sidecar file — the real writer's layout, a
    single ``deletion_vector_<uuid>.bin`` per commit with each vector
    at its own offset — and return {key: descriptor}. Layout per the
    module docstring: 1-byte format version, then per vector 4-byte
    BE length + RoaringBitmapArray bytes + 4-byte BE CRC-32. One file
    per commit keeps the sidecar count O(commits), not O(files)."""
    u = _uuid.uuid4()
    target_dir = os.path.join(table_path, prefix) if prefix else table_path
    os.makedirs(target_dir, exist_ok=True)
    fpath = os.path.join(target_dir, f"deletion_vector_{u}.bin")
    descriptors: dict[Any, dict[str, Any]] = {}
    with open(fpath, "wb") as fh:
        fh.write(b"\x01")
        offset = 1
        for key in sorted(per_key_rows, key=str):
            rows = sorted(set(int(r) for r in per_key_rows[key]))
            data = rba_serialize(rows)
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descriptors[key] = {
                "storageType": "u",
                "pathOrInlineDv": prefix + z85_encode(u.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": len(rows),
            }
            offset += 4 + len(data) + 4
    return descriptors


def inline_dv_descriptor(row_indexes: Iterable[int]) -> dict[str, Any]:
    """Fixture/test writer: an INLINE ("i") descriptor. Z85 needs
    length % 4 == 0; the pad bytes are excluded by sizeInBytes."""
    rows = sorted(set(int(r) for r in row_indexes))
    data = rba_serialize(rows)
    padded = data + bytes(-len(data) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(data),
        "cardinality": len(rows),
    }
