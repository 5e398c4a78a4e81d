"""Dependency-free codecs for UNCOMPRESSED media formats, in pure numpy:

  BMP  (BITMAPINFOHEADER, 8/24/32 bpp, BI_RGB only, top-down or bottom-up)
  PPM  (P6 binary RGB) / PGM (P5 binary grayscale), maxval <= 255
  WAV  (RIFF/WAVE, PCM, 8- or 16-bit, any channel count)

These make ``decode_backend='real'`` real in this container (no
PIL/ffmpeg baked in — compressed formats still route to the PIL probe,
see multimodal._require_pil). Encoders exist so operators can re-encode
after a transform and so tests can synthesize genuine payloads.

All multi-byte integers are little-endian per the format specs; decode
functions validate magics/shapes and raise ValueError on malformed
input rather than guessing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- sniffing


def sniff_format(data: bytes) -> str | None:
    """'bmp' | 'ppm' | 'pgm' | 'wav' | None (unknown/compressed)."""
    if len(data) < 12:
        return None
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# -------------------------------------------------------------------- BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB array.

    Supports BITMAPINFOHEADER (or larger V4/V5 headers, whose leading 40
    bytes are layout-compatible), BI_RGB (uncompressed) at 24/32 bpp and
    8 bpp grayscale-palette, bottom-up (height > 0) or top-down rows.
    Rows are 4-byte aligned per spec."""
    magic, _fsize, _r1, _r2, off = _BMP_FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP: bad magic")
    (hdr_size, width, height, _planes, bpp, comp, _isz, _xp, _yp, n_colors, _ni
     ) = _BMP_INFO_HDR.unpack_from(data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if comp != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {comp}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bpp {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("bad BMP dimensions")
    row_bytes = (width * bpp // 8 + 3) & ~3
    pix = np.frombuffer(data, dtype=np.uint8, count=row_bytes * height, offset=off)
    rows = pix.reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: n_colors BGRX entries after the info header (0 => 256)
        pal_off = 14 + hdr_size
        n_pal = n_colors or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_pal * 4, offset=pal_off
        ).reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows[:, :width]
        return np.ascontiguousarray(pal[idx])
    n_ch = bpp // 8
    px = rows[:, : width * n_ch].reshape(height, width, n_ch)
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array -> 24 bpp bottom-up BI_RGB BMP bytes."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB array")
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    off = 14 + 40
    body = rows.tobytes()
    return (
        _BMP_FILE_HDR.pack(b"BM", off + len(body), 0, 0, off)
        + _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


# --------------------------------------------------------------- PPM/PGM


def _pnm_header_tokens(data: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` ASCII integers after the magic, skipping
    whitespace and '#' comments; returns (values, offset_past_header).
    Per spec exactly ONE whitespace byte follows the last header token."""
    vals: list[int] = []
    i = 2  # past magic
    while len(vals) < n_tokens:
        if i >= len(data):
            raise ValueError("truncated PNM header")
        c = data[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < len(data) and data[j : j + 1].isdigit():
                j += 1
            vals.append(int(data[i:j]))
            i = j
        else:
            raise ValueError(f"bad PNM header byte {c!r}")
    return vals, i + 1  # single whitespace after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM -> (H, W, 3) uint8 RGB; P5 PGM -> (H, W) uint8 gray."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    (w, h, maxval), off = _pnm_header_tokens(data, 3)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    n_ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * n_ch, offset=off)
    arr = px.reshape(h, w, 3) if n_ch == 3 else px.reshape(h, w)
    return np.ascontiguousarray(arr)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) -> P6 PPM; (H, W) -> P5 PGM. uint8 only."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
        h, w = arr.shape[:2]
    elif arr.ndim == 2:
        magic = b"P5"
        h, w = arr.shape
    else:
        raise ValueError("expected (H, W, 3) RGB or (H, W) gray array")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# -------------------------------------------------------------------- WAV


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (sample_rate, (n_samples, n_channels)
    int16 array). 8-bit input (unsigned per spec) is widened to int16."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, raw = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (sz,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _brate, _balign, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM supported, got format {audio_format}")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2")
    elif bits == 8:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n = (samples.size // n_ch) * n_ch
    return rate, np.ascontiguousarray(samples[:n].reshape(-1, n_ch))


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(n_samples,) or (n_samples, n_channels) int16 -> 16-bit PCM WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    body = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------- resize


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W[, C]) array via index maps —
    pure vectorized numpy, the standard box-center sampling grid."""
    h, w = rgb.shape[:2]
    ys = ((np.arange(height) + 0.5) * h / height).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(width) + 0.5) * w / width).astype(np.int64).clip(0, w - 1)
    return np.ascontiguousarray(rgb[ys][:, xs])
