"""PNG codec unit + property tests (VERDICT r8 #2).

PNG is lossless, so every round trip must be BIT-EXACT — across all
five filter types, all supported color types, arbitrary dimensions,
and the palette path. Malformed/unsupported streams must raise
ValueError only (the decode_image fallback contract)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkatoclickhouse_spark.operators import png as P


def _rng(seed):
    return np.random.RandomState(seed % (2**31 - 1))


def test_rgb_roundtrip_bit_exact():
    img = _rng(7).randint(0, 256, (16, 11, 3)).astype(np.uint8)
    assert (P.decode_png(P.encode_png(img, color_type=2)) == img).all()


def test_gray_expands_to_rgb():
    g = _rng(11).randint(0, 256, (9, 13)).astype(np.uint8)
    dec = P.decode_png(P.encode_png(g, color_type=0))
    assert dec.shape == (9, 13, 3)
    assert (dec[..., 0] == g).all() and (dec[..., 1] == g).all()


def test_palette_roundtrip():
    pal = _rng(3).randint(0, 256, (17, 3)).astype(np.uint8)
    idx = _rng(4).randint(0, 17, (8, 6)).astype(np.uint8)
    dec = P.decode_png(P.encode_png(idx, color_type=3, palette=pal))
    assert (dec == pal[idx]).all()


def test_rgba_drops_alpha():
    img = _rng(5).randint(0, 256, (7, 7, 4)).astype(np.uint8)
    dec = P.decode_png(P.encode_png(img, color_type=6))
    assert (dec == img[..., :3]).all()


def test_gray_alpha_drops_alpha():
    img = _rng(6).randint(0, 256, (6, 9, 2)).astype(np.uint8)
    dec = P.decode_png(P.encode_png(img, color_type=4))
    assert (dec[..., 0] == img[..., 0]).all()


def test_each_filter_type_roundtrips():
    """Force a single filter type over every row — each of the five
    unfilter paths is individually exercised and exact."""
    img = _rng(9).randint(0, 256, (12, 10, 3)).astype(np.uint8)
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch)
    for ftype in range(5):
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.uint8)
        for y in range(h):
            raw.append(ftype)
            raw.extend(P._filter_row(ftype, flat[y], prev, ch).tobytes())
            prev = flat[y]
        payload = bytearray(b"\x89PNG\r\n\x1a\n")
        payload += P._chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        )
        payload += P._chunk(b"IDAT", zlib.compress(bytes(raw)))
        payload += P._chunk(b"IEND", b"")
        assert (P.decode_png(bytes(payload)) == img).all(), ftype


def test_adam7_interlaced_roundtrip_bit_exact():
    """r11: Adam7 is a first-class decode path — interlaced and
    sequential serializations of the same image decode identically,
    including dims where some passes are empty."""
    for h, w in [(1, 1), (3, 2), (5, 5), (8, 8), (17, 23)]:
        img = _rng(h * 100 + w).randint(0, 256, (h, w, 3)).astype(np.uint8)
        inter = P.decode_png(P.encode_png(img, color_type=2, interlace=True))
        assert (inter == img).all(), (h, w)


def test_adam7_sequential_data_under_interlaced_header_rejected():
    """Sequential scanline data relabeled interlace=1 has the wrong
    pass-structure byte count — loud ValueError, never a mis-decode."""
    img = _rng(13).randint(0, 256, (5, 5, 3)).astype(np.uint8)
    good = P.encode_png(img, color_type=2)
    ihdr = struct.pack(">IIBBBBB", 5, 5, 8, 2, 0, 0, 1)
    bad = good[:8] + P._chunk(b"IHDR", ihdr) + good[8 + 12 + 13 :]
    with pytest.raises(ValueError):
        P.decode_png(bad)


def test_unsupported_streams_rejected_loudly():
    img = _rng(13).randint(0, 256, (5, 5, 3)).astype(np.uint8)
    good = P.encode_png(img, color_type=2)
    # sub-byte depth (16-bit decodes natively since r12)
    ihdr4 = struct.pack(">IIBBBBB", 5, 5, 4, 0, 0, 0, 0)
    bad4 = good[:8] + P._chunk(b"IHDR", ihdr4) + good[8 + 12 + 13 :]
    with pytest.raises(ValueError, match="bit depth"):
        P.decode_png(bad4)
    # 8-bit data RELABELED depth 16: raster length no longer matches
    ihdr16 = struct.pack(">IIBBBBB", 5, 5, 16, 2, 0, 0, 0)
    bad16 = good[:8] + P._chunk(b"IHDR", ihdr16) + good[8 + 12 + 13 :]
    with pytest.raises(ValueError, match="IDAT payload"):
        P.decode_png(bad16)
    # 16-bit palette is an illegal layout
    ihdr16p = struct.pack(">IIBBBBB", 5, 5, 16, 3, 0, 0, 0)
    bad16p = good[:8] + P._chunk(b"IHDR", ihdr16p) + good[8 + 12 + 13 :]
    with pytest.raises(ValueError, match="palette"):
        P.decode_png(bad16p)
    # corrupted CRC
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        P.decode_png(bytes(corrupt))


def test_decode_image_dispatches_png():
    from kafkatoclickhouse_spark.operators.multimodal import decode_image

    img = _rng(21).randint(0, 256, (6, 8, 3)).astype(np.uint8)
    assert (decode_image(P.encode_png(img, color_type=2)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([0, 2, 4, 6]),
    st.booleans(),
)
def test_property_lossless_roundtrip_any_dims(h, w, seed, color_type, inter):
    """ANY image at ANY dimensions, color type, and interlace layout
    round-trips bit-exactly — rows cycle all five filter types, so
    tall images exercise every unfilter path (in every Adam7 pass
    when interlaced)."""
    ch = P._CHANNELS[color_type]
    img = _rng(seed).randint(0, 256, (h, w, ch)).astype(np.uint8)
    dec = P.decode_png(
        P.encode_png(img, color_type=color_type, interlace=inter)
    )
    assert dec.shape == (h, w, 3)
    if color_type in (2, 6):
        assert (dec == img[..., :3]).all()
    else:
        assert (dec[..., 0] == img[..., 0]).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([0, 2, 4, 6]),
    st.booleans(),
)
def test_property_16bit_roundtrip_any_dims(h, w, seed, color_type, inter):
    """16-bit images at ANY dimensions, color type, and interlace
    layout decode to the high byte of every sample (the documented
    v >> 8 reduction) — the byte-level filter distance bpp = 2·ch
    and the big-endian sample parse are both load-bearing here."""
    ch = P._CHANNELS[color_type]
    img = _rng(seed).randint(0, 65536, (h, w, ch)).astype(np.uint16)
    dec = P.decode_png(
        P.encode_png(img, color_type=color_type, depth=16, interlace=inter)
    )
    assert dec.shape == (h, w, 3)
    hi = (img >> 8).astype(np.uint8)
    if color_type in (2, 6):
        assert (dec == hi[..., :3]).all()
    else:
        assert (dec[..., 0] == hi[..., 0]).all()
        assert (dec[..., 1] == dec[..., 0]).all()


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=2, max_value=300),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_property_malformed_streams_raise_valueerror_only(cut, seed):
    """Truncating or corrupting a valid stream at ANY point raises
    ValueError — never IndexError/struct.error/zlib.error."""
    rng = _rng(seed)
    img = rng.randint(0, 256, (10, 10, 3)).astype(np.uint8)
    payload = P.encode_png(img, color_type=2)
    cut = min(cut, len(payload) - 1)
    corrupted = bytearray(payload)
    corrupted[cut % len(payload)] ^= 0xFF
    garbage = b"\x89PNG\r\n\x1a\n" + bytes(
        rng.randint(0, 256, 64, dtype=np.uint8)
    )
    for stream in (payload[:cut], bytes(corrupted), garbage):
        try:
            P.decode_png(stream)
        except ValueError:
            pass
