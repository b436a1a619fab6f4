"""Dependency-free GIF87a/GIF89a codec (VERDICT r12 #6).

Decoder: header + logical-screen-descriptor parse, global/local
color tables, GIF-variant LZW decompression (LSB-first variable-
width codes, CLEAR/EOI semantics, 12-bit dictionary cap with
post-full deferred-clear tolerance), four-pass interlace scatter,
palette mapping, and first-frame composition onto the logical
screen (background-color fill for sub-screen frames). Extension
blocks (GCE/comment/app — the 89a additions) are walked and
skipped; animated streams decode their FIRST frame, which is the
canonical still for corpus feature extraction. Malformed streams
raise ValueError — triage (``multimodal.classify_image``) routes
those to fallback/undecodable, never a silent mis-decode.

Encoder (fixture synthesis + round-trip tests): real LZW
compression (prefix-dictionary, code-width growth, CLEAR on
dictionary overflow), optional interlacing, 87a or 89a version tag
— so decode tests exercise genuine variable-width code streams,
not the uncompressed-LZW shortcut.

GIF is palette-indexed and LOSSLESS, so the oracled query needs no
carve-out: any closed-form index+palette rule round-trips
bit-exactly (``multimodal.multimodal_decode_gif_stats``).

The reference has no image surface (SURVEY.md §2 [EXT]); public
spec: CompuServe GIF89a specification (1990).
"""

from __future__ import annotations

import struct

import numpy as np

# interlace pass layout: (row offset, row step) per GIF89a spec
# Appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code: int, data: bytes, npix: int) -> np.ndarray:
    """GIF LZW decompression of ``data`` (concatenated sub-block
    payloads) into exactly ``npix`` palette indices."""
    if not (2 <= min_code <= 8):
        raise ValueError(f"bad LZW minimum code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    # dictionary: code -> bytes of indices
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before dictionary entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
                if len(table) == (1 << width) and width < 12:
                    width += 1
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
    if len(out) < npix:
        raise ValueError("LZW output short of pixel count")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF LZW compression (real dictionary growth + CLEAR on
    overflow), LSB-first bit packing."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    prev = b""
    for v in indices.astype(np.uint8).ravel().tobytes():
        k = prev + bytes([v])
        if k in table:
            prev = k
            continue
        put(table[prev])
        if next_code < 4096:
            table[k] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code + 1
            next_code = eoi + 1
        prev = bytes([v])
    if prev:
        put(table[prev])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_gif(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB of the FIRST frame, composed on the
    logical screen (background color where the frame doesn't
    cover). Malformed/truncated streams raise ValueError."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:  # truncated stream
        raise ValueError(f"GIF truncated/malformed: {e}") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing signature)")
    if len(payload) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    sw, sh, packed, bg, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=3 * ncol, offset=pos
        ).reshape(ncol, 3)
        pos += 3 * ncol
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from(
            "<HHHHB", payload, pos + 1
        )
        pos += 10
        ct = gct
        if ipacked & 0x80:
            ncol = 2 << (ipacked & 0x07)
            ct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * ncol, offset=pos
            ).reshape(ncol, 3)
            pos += 3 * ncol
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = payload[pos]
        pos += 1
        chunks = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            chunks += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, bytes(chunks), fw * fh)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("palette index out of range")
        frame = idx.reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: gather rows back
            ordered = np.empty_like(frame)
            src = 0
            for off, step in _INTERLACE_PASSES:
                nrows = len(range(off, fh, step))
                ordered[off:fh:step] = frame[src : src + nrows]
                src += nrows
            frame = ordered
        if gct is not None:
            screen_idx = np.full((sh, sw), bg, dtype=np.uint8)
            screen_ct = gct
        else:
            screen_idx = np.zeros((sh, sw), dtype=np.uint8)
            screen_ct = ct
        if top + fh > sh or left + fw > sw:
            raise ValueError("GIF frame exceeds logical screen")
        # first-frame composition: palette-map frame and screen
        # separately (frame may use a local table)
        rgb = screen_ct[screen_idx]
        rgb[top : top + fh, left : left + fw] = ct[frame]
        return rgb
    raise ValueError("GIF stream contains no image")


# ---------------------------------------------------------------------------
# Encoder (fixtures + round-trip tests)
# ---------------------------------------------------------------------------


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette -> GIF
    bytes (one full-screen frame, global color table, real LZW)."""
    h, w = indices.shape
    ncol = len(palette)
    if not 2 <= ncol <= 256:
        raise ValueError("palette size out of range")
    bits = max(1, (ncol - 1).bit_length())
    size = 1 << bits  # color table sizes are powers of two
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:ncol] = palette
    min_code = max(2, bits)
    out = bytearray(version)
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = indices
    if interlace:
        rows = np.concatenate(
            [indices[off::step] for off, step in _INTERLACE_PASSES]
        )
    out.append(min_code)
    lzw = _lzw_encode(rows, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
