"""Unit tests for the stdlib-only PNG codec (functions/png_codec.py):
encode→decode identity, all five scanline filters on decode, header
fast path, nearest-neighbor resize, and frame-stream splitting."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from neo_olap_spark.functions.png_codec import (
    PNG_SIG,
    _chunk,
    decode_png,
    encode_png,
    png_dimensions,
    resize_nearest,
    split_png_stream,
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(42)
    return rng.randint(0, 256, (37, 23, 3), dtype=np.uint8)


def test_roundtrip_identity(img):
    data = encode_png(img)
    assert np.array_equal(decode_png(data), img)
    assert png_dimensions(data) == (23, 37)


def _refilter(arr: np.ndarray, ftype: int) -> bytes:
    """Reference scanline filterer (per PNG spec) to build inputs the
    encoder never emits, exercising every decode branch."""
    h, w, _ = arr.shape
    stride = w * 3
    flat = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        out.append(ftype)
        up = prev
        for i in range(stride):
            a = flat[y][i - 3] if i >= 3 else 0
            b = up[i]
            c = up[i - 3] if i >= 3 else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((flat[y][i] - pred) & 0xFF)
        prev = flat[y]
    return bytes(out)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_decode_all_filters(img, ftype):
    ihdr = struct.pack(">IIBBBBB", img.shape[1], img.shape[0], 8, 2, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_refilter(img, ftype)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_resize_nearest_mapping(img):
    out = resize_nearest(img, 16, 16)
    assert out.shape == (16, 16, 3)
    # spot-check the index mapping
    assert np.array_equal(out[0, 0], img[0, 0])
    assert np.array_equal(out[15, 15], img[(15 * 37) // 16, (15 * 23) // 16])


def test_split_png_stream(img):
    a = encode_png(img)
    b = encode_png(resize_nearest(img, 8, 8))
    frames = split_png_stream(a + b + a)
    assert [png_dimensions(f) for f in frames] == [(23, 37), (8, 8), (23, 37)]
    assert frames[0] == a and frames[1] == b


def test_reject_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        split_png_stream(encode_png(np.zeros((4, 4, 3), np.uint8)) + b"trailing junk")


def test_roundtrip_property_random_shapes():
    """Hypothesis-style sweep without Spark: every (h, w) from 1x1 to
    a ragged sample of sizes round-trips pixel-exactly."""
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (1, 17), (40, 1), (3, 3), (13, 29), (64, 64), (7, 51)]:
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr), (h, w)


# ---------------------------------------------------------------------------
# dHash kernel invariants (pure Python, no session)
# ---------------------------------------------------------------------------


def _phash_of(arr):
    import pandas as pd

    from neo_olap_spark.functions.png_codec import encode_png
    from neo_olap_spark.operators.multimodal import _phash_batches

    batch = pd.DataFrame({"doc_id": [0], "payload": [encode_png(arr)]})
    out = next(_phash_batches(iter([batch])))
    return int(out["hash_hi"][0]), int(out["hash_lo"][0]), int(out["n_bits"][0])


def test_phash_invariant_under_brightness_shift():
    """dHash compares box sums via s1*c2 > s2*c1; a constant brightness
    shift adds k*c1*c2 to BOTH sides, so the hash is EXACTLY invariant
    — the property that makes it a perceptual (not cryptographic)
    hash. Verified through the full encode->decode->hash path."""
    import numpy as np

    rng = np.random.RandomState(7)
    img = rng.randint(0, 200, size=(31, 37, 3)).astype(np.uint8)
    shifted = (img.astype(np.int64) + 40).astype(np.uint8)  # no clipping
    assert _phash_of(img) == _phash_of(shifted)


def test_phash_distinguishes_mirrored_image():
    import numpy as np

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(29, 33, 3)).astype(np.uint8)
    hi1, lo1, _ = _phash_of(img)
    hi2, lo2, _ = _phash_of(img[:, ::-1])  # horizontal mirror flips gradients
    assert (hi1, lo1) != (hi2, lo2)
