"""Dependency-free PNG codec (VERDICT r8 #2 — closes the last
in-container codec gap; only stdlib ``zlib`` + numpy).

Decoder: PNG (ISO/IEC 15948 / RFC 2083) — signature check, chunk
walk with length/type/CRC framing, IHDR parse, PLTE capture, IDAT
concatenation + zlib inflate, per-row unfiltering (all five filter
types: None/Sub/Up/Average/Paeth), and sample expansion to the
(h, w, 3) uint8 RGB contract shared by every decoder in
``multimodal.decode_image``. Supported: bit depth 8, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) — alpha is
dropped (the decode contract is RGB pixels). Rejected LOUDLY
(ValueError, like the JPEG decoder's contract): interlaced (Adam7)
streams, bit depths other than 8, unknown color types, bad
signature/CRC/layout — and any internal IndexError/struct.error
from truncated garbage is normalized to ValueError too.

Encoder: the matching writer used for fixture synthesis and
round-trip tests — filters each row (cycling through all five
filter types so the decoder's every unfilter path is exercised by
construction), zlib-compresses, and emits IHDR/IDAT/IEND (+PLTE
for palette images) with correct CRCs.

Exactness story for the oracled query
(``multimodal.multimodal_decode_png_stats``): PNG is LOSSLESS, so —
unlike JPEG, which needed the block-constant/DC-quantizer-8
carve-out — ANY pixel rule round-trips bit-exactly and DuckDB can
replay the per-document statistics from the closed-form rule
without ever seeing a byte of PNG. Filtering/unfiltering is pure
prediction coding; correctness of all five paths is additionally
property-pinned by Hypothesis round-trips (``tests/test_png.py``).

Scale: decode is a per-payload numpy kernel in the same
Arrow-batched ``mapInPandas`` slot as PPM/BMP/JPEG — map-only, no
shuffle; the Sub filter unfilters as a vectorized modular cumsum
and Up as a vector add, leaving only Average/Paeth with a per-pixel
recurrence (inherent to the format — libpng walks the same
recurrence in C).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB array. Strict: anything
    outside 8-bit non-interlaced gray/RGB/palette/alpha raises
    ValueError, and so does any truncated/malformed stream."""
    try:
        return _decode_png(payload)
    except (IndexError, KeyError, struct.error, zlib.error) as exc:
        raise ValueError(f"malformed PNG stream: {exc!r}") from exc


def _decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...): skipped
    if ihdr is None:
        raise ValueError("PNG stream missing IHDR")
    w, h, depth, color_type, compression, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    if compression != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG unsupported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT payload is {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        out[y] = _unfilter_row(int(filters[y]), rows[y], prev, ch)
        prev = out[y]
    px = out.reshape(h, w, ch)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px.copy()
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # color_type 6: drop alpha


def _unfilter_row(
    ftype: int, filt: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """One scanline of RFC-2083 §6 unfiltering. ``prev`` is the
    reconstructed row above (zeros for the first row)."""
    if ftype == 0:  # None
        return filt.copy()
    if ftype == 2:  # Up
        return filt + prev  # uint8 wraparound IS the mod-256 add
    if ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] — a
        # modular prefix sum over each intra-pixel channel lane,
        # vectorized as cumsum mod 256 per lane.
        lanes = filt.reshape(-1, bpp).astype(np.int64)
        return (
            np.cumsum(lanes, axis=0) % 256
        ).astype(np.uint8).reshape(-1)
    n = filt.shape[0]
    recon = np.zeros(n, dtype=np.int64)
    f = filt.astype(np.int64)
    p = prev.astype(np.int64)
    if ftype == 3:  # Average
        for x in range(n):
            left = recon[x - bpp] if x >= bpp else 0
            recon[x] = (f[x] + (left + p[x]) // 2) % 256
        return recon.astype(np.uint8)
    if ftype == 4:  # Paeth
        for x in range(n):
            a = recon[x - bpp] if x >= bpp else 0
            b = p[x]
            c = p[x - bpp] if x >= bpp else 0
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            recon[x] = (f[x] + pred) % 256
        return recon.astype(np.uint8)
    raise ValueError(f"unknown PNG filter type {ftype}")


# --------------------------- encoder ---------------------------------


def _filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Forward filter (encoder side) — exact inverse of
    :func:`_unfilter_row` by construction."""
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    upleft = np.zeros_like(p)
    upleft[bpp:] = p[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - (left + p) // 2
    elif ftype == 4:
        pa = np.abs(p - upleft)
        pb = np.abs(left - upleft)
        pc = np.abs(left + p - 2 * upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft)
        )
        out = r - pred
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray,
    color_type: int = 2,
    palette: np.ndarray | None = None,
    level: int = 6,
) -> bytes:
    """(h, w[, ch]) uint8 array -> PNG bytes. ``img`` is gray (2-D or
    trailing dim 1) for color type 0, RGB for 2, palette INDICES for
    3 (pass ``palette`` as (k, 3) uint8), gray+alpha for 4, RGBA for
    6. Rows cycle through all five filter types (y % 5), so every
    decoder unfilter path is exercised by any image ≥5 rows tall."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch != _CHANNELS[color_type]:
        raise ValueError(
            f"color type {color_type} needs {_CHANNELS[color_type]} "
            f"channels, got {ch}"
        )
    if color_type == 3 and palette is None:
        raise ValueError("palette encoding requires a palette")
    stride = w * ch
    flat = img.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = y % 5
        raw.append(ftype)
        raw.extend(_filter_row(ftype, flat[y], prev, ch).tobytes())
        prev = flat[y]
    out = bytearray(_SIGNATURE)
    out.extend(
        _chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0),
        )
    )
    if color_type == 3:
        out.extend(
            _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
        )
    out.extend(_chunk(b"IDAT", zlib.compress(bytes(raw), level)))
    out.extend(_chunk(b"IEND", b""))
    return bytes(out)
