"""Puffin file format (public spec, iceberg.apache.org/puffin-spec) —
the stats/blob container Iceberg v3 stores DELETION VECTORS in.

Scope: exactly what the v3 read path needs plus a fixture writer.

* File layout: ``Magic Blob^{0..n} Footer``; footer is
  ``Magic FooterPayload FooterPayloadSize(4B LE) Flags(4B) Magic``.
  FooterPayload is UTF-8 JSON (optionally zstd-compressed — decoded
  via pyarrow's zstd codec when importable, refused by name when the
  environment lacks one; r11) listing each blob's
  type/fields/offset/length.
* ``deletion-vector-v1`` blob (iceberg table spec v3): combined length
  of magic+vector as 4 bytes BIG-endian, the 4-byte magic
  ``D1 D3 39 64``, the vector in the 64-bit portable Roaring bitmap
  serialization, then a CRC-32 of magic+vector as 4 bytes big-endian.
* Portable 64-bit roaring (RoaringFormatSpec "portableformat"): an
  8-byte little-endian count of 32-bit bitmaps, then for each — in
  unsigned key order — the 4-byte little-endian high-32-bit key and a
  standard 32-bit roaring bitmap of the low words. The 32-bit codec is
  shared with the Delta DV stack (delta_dv.roaring32_*), which pins it
  to the RoaringFormatSpec's container rules.

Reference parity note: the reference engine (Scala DStream collector,
Collector.scala:19-105) has no table format at all; this exists so the
engine can read what v3-era foreign writers (Spark 4 + Iceberg 1.8+,
Flink CDC) produce.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Any, Iterable

from sparkstreamingtwitter_presidential_spark.sources.delta_dv import (
    roaring32_deserialize,
    roaring32_serialize,
)

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DV_BLOB_TYPE = "deletion-vector-v1"
_FLAG_FOOTER_COMPRESSED = 0x1  # byte 0, bit 0


def portable64_serialize(values: Iterable[int]) -> bytes:
    """64-bit portable roaring: LE count of 32-bit bitmaps, then per
    key (unsigned ascending) the LE key + standard 32-bit bitmap."""
    by_high: dict[int, list[int]] = {}
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("row position must be non-negative")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(by_high)))
    for key in sorted(by_high):
        out += struct.pack("<I", key)
        out += roaring32_serialize(by_high[key])
    return bytes(out)


def portable64_deserialize(data: bytes) -> list[int]:
    (n,) = struct.unpack_from("<q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = roaring32_deserialize(data, pos)
        out.extend((key << 32) | v for v in vals)
    return out


def serialize_dv_blob(row_positions: Iterable[int]) -> bytes:
    """One deletion-vector-v1 blob payload (the bytes stored between
    the manifest entry's content_offset and content_size_in_bytes)."""
    vec = portable64_serialize(sorted(set(int(p) for p in row_positions)))
    body = DV_MAGIC + vec
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def deserialize_dv_blob(blob: bytes) -> list[int]:
    """Decode one deletion-vector-v1 blob -> sorted row positions.
    Verifies the length prefix, magic, and CRC-32 (refuse over wrong
    rows, same policy as the Delta DV codec)."""
    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)}B)")
    (body_len,) = struct.unpack_from(">i", blob, 0)
    if body_len + 8 != len(blob):
        raise ValueError(
            f"deletion-vector blob length mismatch: prefix says "
            f"{body_len}, blob carries {len(blob) - 8}"
        )
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4]!r} (want {DV_MAGIC!r})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector blob CRC mismatch")
    return sorted(portable64_deserialize(body[4:]))


def write_puffin(
    path: str, blobs: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Write a Puffin file of ``blobs`` (each: {"type", "payload":
    bytes, optional "fields"/"snapshot-id"/"sequence-number"/
    "properties"}) and return the footer's blob-metadata list with the
    resolved offset/length — exactly what a manifest entry needs for
    content_offset / content_size_in_bytes. Uncompressed footer."""
    metas: list[dict[str, Any]] = []
    with open(path, "wb") as fh:
        fh.write(PUFFIN_MAGIC)
        for b in blobs:
            payload: bytes = b["payload"]
            off = fh.tell()
            fh.write(payload)
            m: dict[str, Any] = {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": int(b.get("snapshot-id", 0)),
                "sequence-number": int(b.get("sequence-number", 0)),
                "offset": off,
                "length": len(payload),
            }
            if b.get("properties"):
                m["properties"] = dict(b["properties"])
            metas.append(m)
        footer = json.dumps(
            {"blobs": metas, "properties": {}}, separators=(",", ":")
        ).encode()
        fh.write(PUFFIN_MAGIC)
        fh.write(footer)
        fh.write(struct.pack("<i", len(footer)))
        fh.write(struct.pack("<i", 0))  # flags: footer uncompressed
        fh.write(PUFFIN_MAGIC)
    return metas


def read_puffin_footer(path: str) -> dict[str, Any]:
    """Parse a Puffin file's footer -> the JSON payload dict. Verifies
    both footer magics and the leading file magic. ZSTD-compressed
    footers (spec-optional; some foreign writers enable it) decode via
    pyarrow's zstd codec when it is available — streaming decode, so
    the frame needs no embedded content size — and refuse by name when
    no codec exists in the environment (this engine never emits the
    flag itself)."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        head = fh.read(4)
        if head != PUFFIN_MAGIC:
            raise ValueError(f"{path} is not a Puffin file (magic {head!r})")
        fh.seek(size - 12)
        tail = fh.read(12)
        (payload_size,) = struct.unpack_from("<i", tail, 0)
        flags = tail[4:8]
        if tail[8:12] != PUFFIN_MAGIC:
            raise ValueError(f"{path}: trailing Puffin magic missing")
        fh.seek(size - 12 - payload_size - 4)
        lead = fh.read(4)
        if lead != PUFFIN_MAGIC:
            raise ValueError(
                f"{path}: footer-leading Puffin magic missing (footer "
                "payload size corrupt?)"
            )
        payload = fh.read(payload_size)
    if flags[0] & _FLAG_FOOTER_COMPRESSED:
        payload = _zstd_decompress(payload, path)
    return json.loads(payload.decode())


def _zstd_decompress(payload: bytes, path: str) -> bytes:
    try:
        import pyarrow as pa

        pa.Codec("zstd")
    except Exception:
        raise NotImplementedError(
            f"{path}: zstd-compressed Puffin footer needs a zstd codec "
            "and none is importable in this environment (pyarrow built "
            "without zstd); uncompressed footers read natively"
        ) from None
    return pa.input_stream(pa.py_buffer(payload), compression="zstd").read()


def read_blob(path: str, offset: int, length: int) -> bytes:
    """Read one blob's bytes by the manifest-carried offset/length —
    no footer parse needed (the spec stores them in the manifest entry
    precisely so scans can skip it)."""
    with open(path, "rb") as fh:
        fh.seek(int(offset))
        data = fh.read(int(length))
    if len(data) != int(length):
        raise ValueError(
            f"{path}: blob truncated (want {length}B at {offset}, got "
            f"{len(data)})"
        )
    return data
