"""GIF codec pins (r13 — VERDICT r12 #6): LZW round-trips with real
dictionary growth, interlace scatter/gather, palette mapping,
first-frame composition, extension skip, loud rejects, and triage
routing for GIF + WebP."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkatoclickhouse_spark.operators import gif as G
from kafkatoclickhouse_spark.operators.multimodal import (
    classify_image,
    decode_image,
)


def _rand_case(rng, h, w, ncol):
    idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
    return idx, pal


def test_roundtrip_plain_and_interlaced_all_palette_sizes():
    rng = np.random.RandomState(3)
    for ncol in (2, 3, 4, 16, 130, 256):
        for interlace in (False, True):
            idx, pal = _rand_case(rng, 13, 9, ncol)
            out = G.decode_gif(
                G.encode_gif(idx, pal, interlace=interlace)
            )
            assert np.array_equal(out, pal[idx]), (ncol, interlace)


def test_lzw_dictionary_overflow_clear():
    """>4096 dictionary entries forces a mid-stream CLEAR: noise at
    max palette over a large image exercises the overflow path on
    both sides."""
    rng = np.random.RandomState(9)
    idx, pal = _rand_case(rng, 80, 80, 256)
    out = G.decode_gif(G.encode_gif(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_first_frame_composition_and_background():
    """A frame smaller than the logical screen composes over the
    background color — built by hand (the encoder always writes
    full-screen frames)."""
    import struct

    pal = np.array(
        [[250, 1, 2], [3, 250, 4], [5, 6, 250], [9, 9, 9]],
        dtype=np.uint8,
    )
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    full = G.encode_gif(idx, pal)
    # rebuild: screen 4x4, bg color 3, frame 2x2 at (1,1)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x81, 3, 0)
    tbl = np.zeros((4, 3), dtype=np.uint8)
    tbl[:4] = pal
    out += tbl.tobytes()
    i = full.find(b"\x2c")
    desc = bytearray(full[i : i + 10])
    struct.pack_into("<HHHH", desc, 1, 1, 1, 2, 2)
    out += desc + full[i + 10 :]
    img = G.decode_gif(bytes(out))
    assert img.shape == (4, 4, 3)
    assert np.array_equal(img[1:3, 1:3], pal[idx])
    assert np.array_equal(img[0, 0], pal[3])


def test_extension_blocks_skipped_and_first_frame_wins():
    rng = np.random.RandomState(1)
    idx, pal = _rand_case(rng, 5, 5, 8)
    enc = G.encode_gif(idx, pal)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    i = enc.find(b"\x2c")
    spliced = enc[:i] + gce + comment + enc[i:]
    assert np.array_equal(G.decode_gif(spliced), pal[idx])
    # a second frame appended after the first is ignored
    second = enc[i:-1]  # image block without trailer
    two = enc[:-1] + second + b"\x3b"
    assert np.array_equal(G.decode_gif(two), pal[idx])


def test_malformed_raise_valueerror_only():
    rng = np.random.RandomState(2)
    idx, pal = _rand_case(rng, 6, 6, 8)
    enc = G.encode_gif(idx, pal)
    for bad in (
        b"notgif",
        b"GIF89a",
        enc[:20],
        enc[:-10],
        enc[: enc.find(b"\x2c") + 5],
    ):
        with pytest.raises(ValueError):
            G.decode_gif(bad)


def test_decode_image_dispatch_and_triage():
    rng = np.random.RandomState(4)
    idx, pal = _rand_case(rng, 7, 7, 16)
    for ver, detail in ((b"GIF87a", "gif87a"), (b"GIF89a", "gif89a")):
        enc = G.encode_gif(idx, pal, version=ver)
        assert np.array_equal(decode_image(enc), pal[idx])
        assert classify_image(enc) == ("gif", "pure", detail)
    webp = b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd"
    assert classify_image(webp) == ("webp", "fallback", "webp")
    # corrupt GIF routes error, not a raise out of triage
    enc = bytearray(G.encode_gif(idx, pal))
    fmt, path, _ = classify_image(bytes(enc[:-12]))
    assert (fmt, path) == ("gif", "error")


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ncol=st.integers(min_value=2, max_value=256),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_property_roundtrip(h, w, ncol, interlace, seed):
    rng = np.random.RandomState(seed)
    idx, pal = _rand_case(rng, h, w, ncol)
    out = G.decode_gif(G.encode_gif(idx, pal, interlace=interlace))
    assert np.array_equal(out, pal[idx])
