"""Dependency-free WebP-lossless (VP8L) codec — the sixth member of
the from-scratch codec family (VERDICT r13 #7; spec: RFC 9649 /
"WebP Lossless Bitstream Specification"). [EXT] — no reference
counterpart (SURVEY §2.2); the reference's only byte handling is
Kafka deserialization (``MyKafkaDeserializationSchema.scala``).

Decoder scope (the crawl-relevant lossless subset):
  - RIFF/WEBP container walk to the ``VP8L`` chunk (``VP8 `` lossy
    and ``VP8X``-extended streams route ``fallback`` in triage —
    VP8 is a full video intra codec, out of scope by design);
  - LSB-first bit reader;
  - canonical prefix codes, BOTH wire forms: the 1-2-symbol
    "simple" form and the full form (code-length code over the
    19-symbol kCodeLengthCodeOrder alphabet, DEFLATE-style 16/17/18
    repeat symbols, optional max_symbol cap);
  - the 5-code pixel bundle (green+length+cache / red / blue /
    alpha / distance);
  - LZ77 backward references with the 120-entry 2D near-distance
    mapping and the (2 + (code & 1)) << extra prefix value scheme;
  - color cache ((0x1e35a7bd * argb) >> (32 - bits)), updated on
    EVERY emitted pixel exactly as libwebp does;
  - the subtract-green transform (inverse applied post-decode).
  Predictor / color / color-indexing transforms and meta prefix
  images raise ValueError — triage inspects the transform list bits
  and routes those streams ``fallback`` BEFORE a decode is
  attempted, never silently mis-decodes.

Encoder (fixture synthesis + round-trip tests): literal pixels with
real canonical prefix codes (frequency-built, depth-capped, written
through the full code-length-code wire form or the simple form when
a channel has ≤2 symbols), optional subtract-green, optional color
cache, and a run-length LZ77 mode (distance-1 copies through the
plain-distance escape 120 + d) — enough to make every decoder path
load-bearing under Hypothesis round-trips, since encode is exact:
VP8L is lossless, decode(encode(img)) == img bit-for-bit.

Scale: like the JPEG/PNG/GIF kernels, encode/decode run row-local
inside Arrow ``mapInPandas`` stages; only (doc_id, stats) rows ever
reach a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# RFC 9649 5.2.2: order in which code-length code lengths are read
K_CODE_LENGTH_ORDER = [
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
]

# RFC 9649 5.2.3: the 120 near-distance (dx, dy) pairs
K_DISTANCES = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

GREEN_LITERALS = 256
LENGTH_CODES = 24
DIST_CODES = 40
MAX_CODE_LENGTH = 15
COLOR_CACHE_MULT = 0x1E35A7BD


class _BitReader:
    """LSB-first bit reader over bytes (VP8L convention: fields pack
    little-endian; prefix-code BITS also read LSB-first, but the
    codes themselves are canonical MSB-first values — see
    ``_PrefixDecoder``)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        # prefix-code bits go to the stream MSB-first (the DEFLATE
        # convention VP8L shares)
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment (shorter codes
    first, ties by symbol index — RFC 1951 rule, which VP8L uses)."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixDecoder:
    """Bit-by-bit canonical decode: accumulate MSB-first code value
    from LSB-first stream bits."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            # degenerate: one symbol, zero bits consumed
            self.single: int | None = nz[0][1]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {
            (ln, code): sym for sym, (code, ln) in codes.items()
        }
        self.max_len = max(ln for ln, _ in self.table)

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        for ln in range(1, self.max_len + 1):
            acc = (acc << 1) | br.read(1)
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    """One prefix code, either wire form (RFC 9649 5.2.2)."""
    if br.read(1):  # simple code
        num_symbols = 1 + br.read(1)
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
        return _PrefixDecoder(lengths)

    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * len(K_CODE_LENGTH_ORDER)
    for i in range(num_code_lengths):
        cl_lengths[K_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_dec = _PrefixDecoder(cl_lengths)

    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_dec.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _PrefixDecoder(lengths)


def _prefix_value_decode(br: _BitReader, code: int) -> int:
    """Length/distance value from its prefix code (5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_value_encode(v: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    vm = v - 1
    h = vm.bit_length() - 1  # highest bit position
    b = (vm >> (h - 1)) & 1  # second-highest bit
    code = 2 * h + b
    extra = h - 1
    offset = (2 + b) << extra
    return code, vm - offset, extra


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _find_vp8l_chunk(payload: bytes) -> bytes:
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF stream")
    if payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP stream")
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"VP8L":
            return body
        if cid == b"VP8 ":
            raise ValueError("lossy VP8 stream (fallback class)")
        i += 8 + size + (size % 2)
    raise ValueError("no VP8L chunk")


def vp8l_features(payload: bytes) -> dict:
    """Header + transform-list inspection WITHOUT a full decode —
    what the triage needs to route a stream pure vs fallback.
    Returns dict(width, height, alpha, transforms) where transforms
    is the list of transform type codes in stream order."""
    body = _find_vp8l_chunk(payload)
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha = br.read(1)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms = []
    while br.read(1):
        t = br.read(2)
        transforms.append(t)
        if t != 2:  # only subtract-green is data-free
            break
    return {
        "width": w,
        "height": h,
        "alpha": bool(alpha),
        "transforms": transforms,
    }


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP (VP8L) bytes -> (h, w, 4) uint8 RGBA array.
    Supported subset per the module docstring; anything else raises
    (callers triage with the feature probe first, exactly like the
    image codecs' ``decode_image`` contract)."""
    body = _find_vp8l_chunk(payload)
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    subtract_green = False
    while br.read(1):
        t = br.read(2)
        if t == 2:
            subtract_green = True
        else:
            raise ValueError(f"unsupported VP8L transform {t}")

    cache_bits = 0
    if br.read(1):  # color cache present
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("bad color cache size")
    if br.read(1):  # meta prefix image
        raise ValueError("meta prefix images unsupported")
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_dec = _read_prefix_code(
        br, GREEN_LITERALS + LENGTH_CODES + cache_size
    )
    red_dec = _read_prefix_code(br, 256)
    blue_dec = _read_prefix_code(br, 256)
    alpha_dec = _read_prefix_code(br, 256)
    dist_dec = _read_prefix_code(br, DIST_CODES)

    n = w * h
    px = np.zeros(n, dtype=np.uint32)  # packed ARGB
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    def cache_insert(argb: int) -> None:
        if cache_size:
            cache[
                ((COLOR_CACHE_MULT * argb) & 0xFFFFFFFF) >> shift
            ] = argb

    pos = 0
    while pos < n:
        s = green_dec.decode(br)
        if s < GREEN_LITERALS:
            g = s
            r = red_dec.decode(br)
            b = blue_dec.decode(br)
            a = alpha_dec.decode(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            px[pos] = argb
            cache_insert(argb)
            pos += 1
        elif s < GREEN_LITERALS + LENGTH_CODES:
            length = _prefix_value_decode(br, s - GREEN_LITERALS)
            dcode = dist_dec.decode(br)
            dist = _prefix_value_decode(br, dcode)
            if dist > 120:
                dist -= 120
            else:
                dx, dy = K_DISTANCES[dist - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("VP8L back-reference before start")
            if pos + length > n:
                raise ValueError("VP8L back-reference overruns image")
            for _ in range(length):
                argb = int(px[pos - dist])
                px[pos] = argb
                cache_insert(argb)
                pos += 1
        else:
            idx = s - GREEN_LITERALS - LENGTH_CODES
            if idx >= cache_size:
                raise ValueError("color cache index out of range")
            px[pos] = cache[idx]
            pos += 1

    a = (px >> 24) & 0xFF
    r = (px >> 16) & 0xFF
    g = (px >> 8) & 0xFF
    b = px & 0xFF
    if subtract_green:
        r = (r + g) & 0xFF
        b = (b + g) & 0xFF
    return (
        np.stack([r, g, b, a], axis=-1)
        .astype(np.uint8)
        .reshape(h, w, 4)
    )


# ---------------------------------------------------------------------------
# encoder (fixture synthesis + round-trip tests)
# ---------------------------------------------------------------------------


def _huffman_lengths(
    freqs: dict[int, int], alphabet_size: int, max_len: int
) -> list[int]:
    """Canonical code lengths from frequencies (heap Huffman); if
    the tree exceeds ``max_len`` fall back to a flat ceil(log2 n)
    code over the used symbols — always short enough here and valid
    for our own decoder (possibly-incomplete canonical codes decode
    fine table-wise)."""
    import heapq

    used = sorted(s for s, f in freqs.items() if f > 0)
    lengths = [0] * alphabet_size
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(
        sorted(freqs.items()) ) if f > 0]
    heapq.heapify(heap)
    tick = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    if max(lengths) > max_len:
        flat = max(1, (len(used) - 1).bit_length())
        if flat > max_len:
            raise ValueError("alphabet too large for flat code")
        lengths = [0] * alphabet_size
        for s in used:
            lengths[s] = flat
    return lengths


def _write_prefix_code(
    bw: _BitWriter, lengths: list[int], alphabet_size: int
) -> None:
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and used[-1] < 256:
        bw.write(1, 1)  # simple form
        bw.write(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)  # first symbol in 8 bits
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # full form
    cl_freq: dict[int, int] = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths = _huffman_lengths(
        cl_freq, len(K_CODE_LENGTH_ORDER), max_len=7
    )
    # num_code_lengths must cover every nonzero CL symbol's slot in
    # the fixed read order
    max_pos = max(
        K_CODE_LENGTH_ORDER.index(s)
        for s, ln in enumerate(cl_lengths)
        if ln > 0
    )
    num = max(4, max_pos + 1)
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl_lengths[K_CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap: all entries written
    cl_codes = _canonical_codes(cl_lengths)
    single_cl = (
        sum(1 for ln in cl_lengths if ln > 0) == 1
    )  # zero-bit CL code: write nothing per entry
    for ln in lengths:
        if not single_cl:
            code, n = cl_codes[ln]
            bw.write_code(code, n)


class _Enc:
    """One prefix code's encode side (handles the zero-bit
    single-symbol degenerate like the decoder does)."""

    def __init__(self, lengths: list[int]) -> None:
        self.n_used = sum(1 for ln in lengths if ln > 0)
        self.codes = _canonical_codes(lengths)

    def put(self, bw: _BitWriter, sym: int) -> None:
        if self.n_used <= 1:
            return
        code, ln = self.codes[sym]
        bw.write_code(code, ln)


MIN_RUN = 3  # shortest distance-1 run worth a back-reference


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    lz77_runs: bool = False,
) -> bytes:
    """(h, w, 3|4) uint8 -> RIFF/WEBP VP8L bytes, losslessly. The
    three switches turn on the decoder paths a plain literal stream
    would leave cold: the subtract-green transform, the color cache,
    and distance-1 run back-references (written through the plain-
    distance escape 120+1)."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) image")
    h, w = img.shape[:2]
    if h > (1 << 14) or w > (1 << 14):
        raise ValueError("image too large for VP8L dims")
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    a = (
        img[..., 3].astype(np.int64)
        if img.shape[2] == 4
        else np.full((h, w), 255, dtype=np.int64)
    )
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    argb = (
        (a << 24) | (r << 16) | (g << 8) | b
    ).reshape(-1)

    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0
    cache = [-1] * cache_size

    # tokenize: ('lit', argb) | ('cache', idx) | ('copy', length)
    tokens: list[tuple[str, int]] = []
    n = len(argb)
    pos = 0
    while pos < n:
        if lz77_runs and pos > 0:
            run = 0
            while (
                pos + run < n
                and argb[pos + run] == argb[pos - 1]
            ):
                run += 1
            if run >= MIN_RUN:
                tokens.append(("copy", run))
                for i in range(run):
                    v = int(argb[pos + i])
                    if cache_size:
                        cache[
                            ((COLOR_CACHE_MULT * v) & 0xFFFFFFFF)
                            >> shift
                        ] = v
                pos += run
                continue
        v = int(argb[pos])
        if cache_size:
            idx = ((COLOR_CACHE_MULT * v) & 0xFFFFFFFF) >> shift
            if cache[idx] == v:
                tokens.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = v
        tokens.append(("lit", v))
        pos += 1

    green_n = GREEN_LITERALS + LENGTH_CODES + cache_size
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d: dict[int, int], k: int) -> None:
        d[k] = d.get(k, 0) + 1

    for kind, val in tokens:
        if kind == "lit":
            bump(gf, (val >> 8) & 0xFF)
            bump(rf, (val >> 16) & 0xFF)
            bump(bf, val & 0xFF)
            bump(af, (val >> 24) & 0xFF)
        elif kind == "cache":
            bump(gf, GREEN_LITERALS + LENGTH_CODES + val)
        else:
            code, _, _ = _prefix_value_encode(val)
            bump(gf, GREEN_LITERALS + code)
            dcode, _, _ = _prefix_value_encode(120 + 1)
            bump(df, dcode)
    for d in (rf, bf, af, df):
        if not d:
            d[0] = 1  # decoder always reads 5 codes

    gl = _huffman_lengths(gf, green_n, MAX_CODE_LENGTH)
    rl = _huffman_lengths(rf, 256, MAX_CODE_LENGTH)
    bl = _huffman_lengths(bf, 256, MAX_CODE_LENGTH)
    al = _huffman_lengths(af, 256, MAX_CODE_LENGTH)
    dl = _huffman_lengths(df, DIST_CODES, MAX_CODE_LENGTH)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
    bw.write(0, 1)  # end of transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix
    for lengths, size in (
        (gl, green_n),
        (rl, 256),
        (bl, 256),
        (al, 256),
        (dl, DIST_CODES),
    ):
        _write_prefix_code(bw, lengths, size)
    ge, re_, be, ae, de = (
        _Enc(gl), _Enc(rl), _Enc(bl), _Enc(al), _Enc(dl),
    )
    for kind, val in tokens:
        if kind == "lit":
            ge.put(bw, (val >> 8) & 0xFF)
            re_.put(bw, (val >> 16) & 0xFF)
            be.put(bw, val & 0xFF)
            ae.put(bw, (val >> 24) & 0xFF)
        elif kind == "cache":
            ge.put(bw, GREEN_LITERALS + LENGTH_CODES + val)
        else:
            code, extra_v, extra_n = _prefix_value_encode(val)
            ge.put(bw, GREEN_LITERALS + code)
            bw.write(extra_v, extra_n)
            dcode, dev, den = _prefix_value_encode(120 + 1)
            de.put(bw, dcode)
            bw.write(dev, den)

    body = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
