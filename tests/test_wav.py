"""PCM WAV codec pins (operators/wav.py, VERDICT r10 #8): Hypothesis
round-trips across bit depths / channel counts / odd data sizes (the
RIFF pad byte), triage routing for non-PCM and truncated streams, and
chunk-walk robustness to unknown chunks."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkatoclickhouse_spark.operators.wav import (
    classify_wav,
    decode_wav,
    encode_wav,
)


@given(
    st.integers(min_value=1, max_value=97),   # n_frames
    st.integers(min_value=1, max_value=3),    # n_channels
    st.sampled_from([8, 16]),
    st.integers(min_value=1, max_value=192_000),  # sample_rate
    st.randoms(use_true_random=False),
)
@settings(max_examples=120, deadline=None)
def test_wav_roundtrip(n_frames, n_ch, bits, rate, rng):
    lo, hi = (-128, 127) if bits == 8 else (-32768, 32767)
    samples = np.array(
        [
            [rng.randint(lo, hi) for _ in range(n_ch)]
            for _ in range(n_frames)
        ],
        dtype=np.int64,
    )
    payload = encode_wav(samples, rate, bits=bits)
    # canonical container: even total length (odd data chunks padded)
    assert len(payload) % 2 == 0
    assert classify_wav(payload) == ("pure", f"pcm{bits}")
    got_rate, got = decode_wav(payload)
    assert got_rate == rate
    assert got.shape == samples.shape
    assert (got == samples).all()


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real WAVs carry LIST/INFO/fact chunks before data — the walk
    must skip them (including odd-size ones with pad bytes)."""
    samples = np.arange(12, dtype=np.int64).reshape(6, 2) - 6
    canonical = encode_wav(samples, 44100)
    # splice an odd-size junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    spliced = canonical[:fmt_end] + junk + canonical[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    rate, got = decode_wav(spliced)
    assert rate == 44100 and (got == samples).all()


def test_wav_triage_routes_never_raise():
    samples = np.zeros((4, 1), dtype=np.int64)
    good = encode_wav(samples, 8000)
    assert classify_wav(good) == ("pure", "pcm16")
    assert classify_wav(b"") == ("undecodable", "not_riff_wave")
    assert classify_wav(b"RIFF\x00\x00\x00\x00WAVE") == (
        "undecodable",
        "no_fmt_chunk",
    )
    assert classify_wav(good[:20]) == ("undecodable", "truncated")
    # a format-3 (IEEE float) TAG on 16-bit data is malformed — only
    # 32-bit floats decode natively (r14); the mislabeled stream
    # must route fallback and raise, never mis-decode
    f32 = bytearray(good)
    f32[20:22] = struct.pack("<H", 3)
    assert classify_wav(bytes(f32)) == ("fallback", "float_bits_16")
    with pytest.raises(ValueError):
        decode_wav(bytes(f32))
    # mu-law and other compressed formats stay fallback
    ulaw = bytearray(good)
    ulaw[20:22] = struct.pack("<H", 7)
    assert classify_wav(bytes(ulaw)) == (
        "fallback",
        "compressed_format_7",
    )


def test_wav_8bit_rebase_matches_convention():
    """8-bit PCM is stored unsigned; decode rebases by -128 so the
    sample domain is signed like every audio stack expects."""
    samples = np.array([[-128], [0], [127]], dtype=np.int64)
    payload = encode_wav(samples, 16000, bits=8)
    data = payload[-4:]  # 3 bytes + pad
    assert data[:3] == bytes([0, 128, 255])
    _, got = decode_wav(payload)
    assert (got == samples).all()


# 24-bit integer + float32 PCM depths (r14, VERDICT r13 #8)


@given(
    st.integers(min_value=1, max_value=61),
    st.integers(min_value=1, max_value=3),
    st.sampled_from([24, 32]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=80, deadline=None)
def test_wav_deep_depth_roundtrip(n_frames, n_ch, bits, rng):
    """24-bit (full ±2^23 range) and float32 (Q15 content) WAVs
    round-trip integer-exactly; both route 'pure' in triage."""
    lo, hi = (
        (-(1 << 23), (1 << 23) - 1) if bits == 24 else (-32768, 32767)
    )
    samples = np.array(
        [
            [rng.randint(lo, hi) for _ in range(n_ch)]
            for _ in range(n_frames)
        ],
        dtype=np.int64,
    )
    payload = encode_wav(samples, 48_000, bits=bits)
    assert len(payload) % 2 == 0
    expect = "pcm24" if bits == 24 else "float32"
    assert classify_wav(payload) == ("pure", expect)
    rate, got = decode_wav(payload)
    assert rate == 48_000
    assert (got == samples).all()


def test_wav_24bit_sign_extension_edges():
    """Bit-23 boundary values: min/−1/0/+1/max must sign-extend
    exactly through the 3-byte LE pack/unpack."""
    edge = np.array(
        [[-(1 << 23)], [-1], [0], [1], [(1 << 23) - 1]], dtype=np.int64
    )
    _, got = decode_wav(encode_wav(edge, 8000, bits=24))
    assert (got == edge).all()
    with pytest.raises(ValueError):
        encode_wav(np.array([[1 << 23]], dtype=np.int64), 8000, bits=24)


def test_wav_float32_non_q15_content_quantizes_half_ulp():
    """Floats that are NOT k/32768 requantize to the nearest Q15
    integer — the documented convention, not an error."""
    import struct as _struct

    payload = bytearray(
        encode_wav(np.array([[100]], dtype=np.int64), 8000, bits=32)
    )
    # overwrite the single float with 0.5000123 (not Q15)
    payload[-4:] = _struct.pack("<f", 0.5000123)
    _, got = decode_wav(bytes(payload))
    assert got[0, 0] == round(0.5000123 * 32768)
