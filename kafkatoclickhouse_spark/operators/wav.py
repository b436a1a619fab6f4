"""Dependency-free PCM WAV (RIFF/WAVE) codec — the audio member of
the from-scratch codec family (PPM/BMP/JPEG/PNG in ``multimodal.py``/
``jpeg.py``/``png.py``; VERDICT r10 #8). [EXT] LLM-pipeline surface:
audio corpora land as WAV/FLAC/MP3 blobs; the engine must at minimum
parse the container, validate the format chunk and expose raw PCM
frames to the feature kernels (frame energy, resample, VAD). This
module implements the uncompressed-PCM subset for real bytes —
integer-exact, so decoded samples are oracle-replayable — and routes
everything else to the same fallback/undecodable triage the image
codecs use.

Format notes (RIFF spec / RFC 2361):
  - ``RIFF`` magic, total size, ``WAVE`` form type;
  - chunk walk: each chunk is (4-byte id, 4-byte LE size, payload,
    pad byte if size is odd) — the pad byte is the classic parser
    bug, exercised by the Hypothesis round-trip on odd data sizes;
  - ``fmt `` chunk: PCM means audio_format == 1; this decoder
    accepts bit depths 16 (LE signed) and 8 (unsigned, rebased to
    signed by −128 like every audio stack);
  - ``data`` chunk: interleaved frames (sample f of channel c at
    index f·n_channels + c).

Scale: encode/decode are row-local kernels inside Arrow
``mapInPandas`` stages — the same slot a libsndfile/ffmpeg decode
occupies at production; nothing here shuffles.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAX_CHUNKS = 64  # defensive bound on the chunk walk


def encode_wav(
    samples: "np.ndarray", sample_rate: int, bits: int = 16
) -> bytes:
    """Serialize an (n_frames, n_channels) integer array as a
    canonical PCM WAV: RIFF header, 16-byte fmt chunk, data chunk,
    odd-size pad byte. ``bits`` 16 → LE int16; 8 → unsigned bytes
    (values expected in [-128, 127], stored +128)."""
    if samples.ndim != 2:
        raise ValueError("samples must be (n_frames, n_channels)")
    n_frames, n_ch = samples.shape
    if bits == 16:
        body = samples.astype("<i2").tobytes()
    elif bits == 8:
        body = (samples.astype(np.int64) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = n_ch * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, block_align, bits
    )
    chunks = b"".join(
        _chunk(cid, payload)
        for cid, payload in ((b"fmt ", fmt), (b"data", body))
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def classify_wav(payload: bytes) -> tuple[str, str]:
    """(path, detail) triage for an audio byte stream — the same
    route contract as ``multimodal.classify_image``: 'pure' when the
    decoder below handles it, 'fallback' for recognized-but-
    compressed/deep streams (production hands those to ffmpeg),
    'undecodable' otherwise. Never raises."""
    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return ("undecodable", "not_riff_wave")
    try:
        fmt, _ = _walk(p)
    except Exception:  # noqa: BLE001 — triage must not raise
        return ("undecodable", "truncated")
    if fmt is None:
        return ("undecodable", "no_fmt_chunk")
    audio_format, _, _, _, _, bits = fmt
    if audio_format != 1:
        return ("fallback", f"compressed_format_{audio_format}")
    if bits not in (8, 16):
        return ("fallback", f"pcm_bits_{bits}")
    return ("pure", f"pcm{bits}")


def _walk(p: bytes):
    """(fmt tuple | None, data bytes | None) from the RIFF chunk
    walk; raises on a truncated chunk header/payload."""
    fmt = None
    data = None
    i = 12
    for _ in range(WAV_MAX_CHUNKS):
        if i == len(p):
            break
        if i + 8 > len(p):
            raise ValueError("truncated chunk header")
        cid = p[i : i + 4]
        size = struct.unpack("<I", p[i + 4 : i + 8])[0]
        if i + 8 + size > len(p):
            raise ValueError("truncated chunk payload")
        payload = p[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            data = payload
        i += 8 + size + (size % 2)  # odd chunks carry a pad byte
    return fmt, data


def decode_wav(payload: bytes):
    """(sample_rate, samples) where samples is an
    (n_frames, n_channels) int64 array — PCM 16-bit LE or 8-bit
    unsigned (rebased −128) only; anything else raises (callers
    triage with :func:`classify_wav` first, exactly like the image
    codecs' ``decode_image`` contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not RIFF")
    if payload[8:12] != b"WAVE":
        raise ValueError("not WAVE")
    fmt, data = _walk(payload)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"compressed format {audio_format}")
    if n_ch < 1:
        raise ValueError("zero channels")
    if bits == 16:
        a = np.frombuffer(
            data[: len(data) - len(data) % 2], dtype="<i2"
        ).astype(np.int64)
    elif bits == 8:
        a = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if block_align != n_ch * (bits // 8):
        raise ValueError("block_align inconsistent with fmt")
    n_frames = len(a) // n_ch
    return sample_rate, a[: n_frames * n_ch].reshape(n_frames, n_ch)
