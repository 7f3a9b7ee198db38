"""Minimal stdlib-only PNG codec (struct + zlib + numpy).

Supports 8-bit RGB (color type 2, no interlace): encode with filter 0,
decode with all five scanline filters (0=None, 1=Sub, 2=Up, 3=Average,
4=Paeth). This is a REAL codec — output opens in any image viewer and
any spec-compliant PNG of this variant decodes — small enough to live
in a data-engine repo, with zero dependencies beyond the container.

Purpose: the multimodal operators (operators/multimodal.py) decode,
resize, and frame-sample binary media columns. PIL/ffmpeg are absent
from this container, so this module provides the codec; a production
deployment swaps in a native library for throughput, not correctness —
the operator plumbing (schemas, Arrow batching, partitioning) is
identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit RGB


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a PNG (filter 0, RGB8)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != _BPP:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter-type byte (0) per scanline, then raw RGB bytes
    raw = np.empty((h, 1 + w * _BPP), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * _BPP)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int) -> np.ndarray:
    stride = w * _BPP
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = lines[:, 0]
    data = lines[:, 1:]
    if not ftypes.any():
        # filter-0-only fast path (what encode_png emits): pure reshape
        return data.reshape(h, w, _BPP).copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        line = data[y].astype(np.int32)
        up = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up: vectorized
            cur = (line + up) & 0xFF
        else:  # Sub / Average / Paeth need the in-scanline recurrence
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - _BPP] if i >= _BPP else 0
                b = up[i]
                c = up[i - _BPP] if i >= _BPP else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    pred = _paeth(int(a), int(b), int(c))
                else:
                    raise ValueError(f"bad PNG filter type {f}")
                cur[i] = (line[i] + pred) & 0xFF
        out[y] = cur
    return out.reshape(h, w, _BPP)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG into an (H, W, 3) uint8 array."""
    if bytes(data[:8]) != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, w, h = 8, [], None, None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + ln])
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 2 or inter != 0:
                raise ValueError("unsupported PNG variant (need RGB8 non-interlaced)")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    return _unfilter(zlib.decompress(b"".join(idat)), w, h)


def png_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decompressing pixel data —
    the metadata-only fast path (a 100 TB scan that just needs
    dimensions should never inflate IDAT)."""
    if bytes(data[:8]) != PNG_SIG or bytes(data[12:16]) != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, 3) array — pure numpy
    index mapping, the deterministic thumbnail kernel."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def split_png_stream(data: bytes) -> list[bytes]:
    """Split a byte stream of back-to-back PNGs into individual files
    (the stand-in container format for multi-frame media): scan each
    PNG's chunk list to its IEND and cut there."""
    frames, pos = [], 0
    data = bytes(data)
    while pos < len(data):
        if data[pos : pos + 8] != PNG_SIG:
            raise ValueError(f"bad frame boundary at offset {pos}")
        cur = pos + 8
        while True:
            (ln,) = struct.unpack(">I", data[cur : cur + 4])
            tag = data[cur + 4 : cur + 8]
            cur += 12 + ln
            if tag == b"IEND":
                break
        frames.append(data[pos:cur])
        pos = cur
    return frames
