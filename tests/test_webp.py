"""VP8L (lossless WebP) codec pins (operators/webp.py, r14 —
VERDICT r13 #7). The oracled query certifies the fixture path; these
tests cover the rest: arbitrary-content lossless round-trips across
every encoder switch combination, the prefix-code wire forms, the
distance mapping, triage routing, and loud rejection of the
unsupported feature classes."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkatoclickhouse_spark.operators import webp as W
from kafkatoclickhouse_spark.operators.multimodal import decode_image


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sg=st.booleans(),
    cache=st.sampled_from([0, 3, 8]),
    lz=st.booleans(),
    palette=st.sampled_from([2, 7, 0]),  # 0 = full-range noise
)
def test_property_vp8l_lossless_roundtrip(
    h, w, seed, sg, cache, lz, palette
):
    """decode(encode(img)) == img bit-for-bit for ANY content under
    every switch combination — VP8L is lossless, so equality is the
    whole contract. Small palettes force color-cache hits and runs;
    noise forces deep full-form prefix tables."""
    rng = np.random.RandomState(seed)
    if palette:
        colors = rng.randint(0, 256, (palette, 3), dtype=np.uint8)
        idx = rng.randint(0, palette, (h, w))
        img = colors[idx]
    else:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    payload = W.encode_webp(
        img, subtract_green=sg, cache_bits=cache, lz77_runs=lz
    )
    out = W.decode_webp(payload)
    assert out.shape == (h, w, 4)
    assert np.array_equal(out[..., :3], img)
    assert (out[..., 3] == 255).all()


def test_vp8l_alpha_channel_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (9, 11, 4), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp(img, cache_bits=4, lz77_runs=True))
    assert np.array_equal(out, img)


def test_vp8l_prefix_value_scheme_inverts():
    """The (2 + (code & 1)) << extra length/distance scheme must
    invert exactly over a wide value range."""
    for v in list(range(1, 200)) + [255, 1024, 4095, 65536]:
        code, extra_v, extra_n = W._prefix_value_encode(v)
        bw = W._BitWriter()
        bw.write(extra_v, extra_n)
        br = W._BitReader(bw.tobytes() or b"\x00")
        assert W._prefix_value_decode(br, code) == v, v


def test_vp8l_features_and_triage_routes():
    from kafkatoclickhouse_spark.operators.multimodal import (
        classify_image,
    )

    img = np.full((4, 4, 3), 9, dtype=np.uint8)
    pure = W.encode_webp(img, subtract_green=True)
    feats = W.vp8l_features(pure)
    assert (feats["width"], feats["height"]) == (4, 4)
    assert feats["transforms"] == [2]
    assert classify_image(pure) == ("webp", "pure", "vp8l")

    # lossy VP8 container → fallback, detail unchanged from r13
    body = b"WEBPVP8 " + struct.pack("<I", 4) + bytes(4)
    lossy = b"RIFF" + struct.pack("<I", len(body)) + body
    assert classify_image(lossy) == ("webp", "fallback", "webp")
    with pytest.raises(ValueError):
        W.decode_webp(lossy)

    # an unsupported transform type routes fallback WITHOUT a
    # decode attempt: patch the transform bits (type 0 = predictor)
    raw = bytearray(W.encode_webp(img))
    # VP8L body starts after 12 (RIFF) + 8 (chunk hdr) + 1 (0x2f);
    # header = 14+14+1+3 = 32 bits; transform list begins at bit 32
    base = 12 + 8 + 1
    byte, bit = base + 32 // 8, 0
    raw[byte] |= 1 << bit  # present=1, type bits stay 00 → predictor
    assert classify_image(bytes(raw)) == (
        "webp",
        "fallback",
        "vp8l_transform",
    )
    with pytest.raises(ValueError):
        W.decode_webp(bytes(raw))


def test_vp8l_decode_image_dispatch():
    img = np.full((6, 5, 3), 77, dtype=np.uint8)
    img[2:, 1:3] = (1, 2, 3)
    arr = decode_image(W.encode_webp(img, cache_bits=5, lz77_runs=True))
    assert arr.shape == (6, 5, 3)
    assert np.array_equal(arr, img)


def test_vp8l_truncated_and_garbage_raise_valueerror_only():
    img = np.full((8, 8, 3), 31, dtype=np.uint8)
    payload = W.encode_webp(img, cache_bits=4, lz77_runs=True)
    for cut in (10, 13, 21, len(payload) - 3):
        with pytest.raises(ValueError):
            W.decode_webp(payload[:cut])
    with pytest.raises(ValueError):
        W.decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
