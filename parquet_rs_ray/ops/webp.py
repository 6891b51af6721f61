"""WebP LOSSLESS (VP8L) decode — pure numpy/python, no codec library.

WebP splits into a lossy half (VP8 intra-frame coding: boolean
arithmetic coder — the named seam, like arithmetic JPEG) and the
lossless half VP8L, which is Huffman + LZ77 + four spatial transforms:
no arithmetic coding anywhere, so it decodes exactly with the same
machinery class as the GIF/PNG work (ops/gif.py, ops/png.py). This
module implements the full VP8L feature grid per the public "WebP
Lossless Bitstream Specification":

* RIFF container walk (bare ``VP8L`` and extended ``VP8X`` layouts);
  lossy ``VP8 `` chunks raise the codec-library seam.
* LSB-first bit reader; canonical prefix codes with a 15-bit LUT
  (codes are canonical like DEFLATE's, read most-significant-bit-first
  down the tree, so LUT keys are the bit-reversed codes); "simple"
  (1-2 symbol) and "normal" (code-length-coded, repeat codes 16/17/18,
  optional max_symbol cap) code transports.
* Entropy-coded image streams: color cache (the 0x1e35a7bd
  multiplicative hash), meta-prefix-code entropy image (per-tile
  Huffman group selection), LZ77 green/length/distance alphabet with
  the 120-entry 2D distance neighborhood map.
* All four transforms, inverted in reverse read order: PREDICTOR (14
  modes), COLOR (signed ``(t*c)>>5`` cross-channel deltas),
  SUBTRACT_GREEN, COLOR_INDEXING (delta-coded palette, sub-byte index
  bundling for palettes ≤ 16 colors).

Scale shape: one payload decodes inside one actor task
(ops/multimodal.DecodeImage), like every other image codec here — the
corpus parallelism is across payloads, not within one.

Reference anchor: no parquet-rs counterpart (storage engine); this
closes the webp half of the multimodal seam named in VERDICT r4 §1.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WebpError", "decode_webp"]


class WebpError(ValueError):
    """Malformed or truncated WebP/VP8L input."""


# ---------------------------------------------------------------- bit IO

class _BitReader:
    """LSB-first bit reader over a bytes buffer (VP8L convention:
    values are read least-significant bit first)."""

    __slots__ = ("data", "pos", "bitbuf", "nbits", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 48 and self.pos < self.n:
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill()
            if self.nbits < k:
                raise WebpError("truncated VP8L stream")
        out = self.bitbuf & ((1 << k) - 1)
        self.bitbuf >>= k
        self.nbits -= k
        return out

    def peek15(self) -> int:
        if self.nbits < 15:
            self._fill()
        return self.bitbuf & 0x7FFF

    def skip(self, k: int) -> None:
        self.bitbuf >>= k
        self.nbits -= k
        if self.nbits < 0:
            raise WebpError("truncated VP8L stream")


_MAX_LEN = 15


class _Prefix:
    """Canonical prefix code with a 15-bit LUT: entry = (sym << 4) |
    code_length; length 0 marks an invalid peek (only possible on
    corrupt input). A single-symbol code reads ZERO bits."""

    __slots__ = ("lut", "single")

    def __init__(self, lengths: np.ndarray):
        nz = np.flatnonzero(lengths)
        if len(nz) == 0:
            raise WebpError("empty prefix code")
        if len(nz) == 1:
            self.single = int(nz[0])
            self.lut = None
            return
        self.single = -1
        lens = lengths[nz]
        if lens.max() > _MAX_LEN:
            raise WebpError("prefix code length > 15")
        # Kraft must be exactly 1 (complete code) — the bitstream has
        # no way to resynchronize after an unassigned prefix
        if int((1 << (_MAX_LEN - lens.astype(np.int64))).sum()) \
                != (1 << _MAX_LEN):
            raise WebpError("over/under-subscribed prefix code")
        # canonical assignment: symbols sorted by (length, symbol)
        order = np.lexsort((nz, lens))
        syms, lens = nz[order], lens[order]
        lut = np.zeros(1 << _MAX_LEN, dtype=np.uint32)
        code = 0
        prev_len = int(lens[0])
        for s, ln in zip(syms, lens):
            ln = int(ln)
            code <<= (ln - prev_len)
            prev_len = ln
            # LUT key = bit-REVERSED code in the low ln bits (the
            # stream is LSB-first; the code descends MSB-first)
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            step = 1 << ln
            lut[rev::step] = (int(s) << 4) | ln
            code += 1
        self.lut = lut

    def read(self, br: _BitReader) -> int:
        if self.single >= 0:
            return self.single
        e = int(self.lut[br.peek15()])
        ln = e & 0xF
        if ln == 0:
            raise WebpError("invalid prefix code word")
        br.skip(ln)
        return e >> 4


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Prefix:
    """One prefix code, simple or normal transport (spec §6.2.3)."""
    lengths = np.zeros(alphabet_size, np.int64)
    if br.read(1):                       # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise WebpError("simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise WebpError("bad second simple-code symbol")
            lengths[s1] = 1
        return _Prefix(lengths)     # 1 symbol ⇒ zero-bit reads
    num_codes = 4 + br.read(4)
    cl_lengths = np.zeros(19, np.int64)
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = _Prefix(cl_lengths)
    if br.read(1):                       # explicit symbol-count cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_tree.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, value = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, value = 3 + br.read(3), 0
            else:                        # 18
                repeat, value = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise WebpError("code-length repeat overruns alphabet")
            if value:
                lengths[symbol:symbol + repeat] = value
            symbol += repeat
    return _Prefix(lengths)


# ------------------------------------------------------ entropy images

def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (spec §5.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# the 120-entry (dx, dy) near-neighborhood distance map (spec §5.2.2)
_DIST_MAP = (
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
    (-6, 6), (2, 8), (-2, 8), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
    (8, 4), (3, 8), (-3, 8), (8, 5), (4, 8), (-4, 8), (6, 7), (-6, 7),
)


def _plane_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


_HASH_MUL = np.uint64(0x1E35A7BD)


def _decode_entropy_image(br: _BitReader, xsize: int, ysize: int,
                          is_level0: bool,
                          transforms: list | None = None) -> np.ndarray:
    """One entropy-coded ARGB image (spec §6.2) → uint32 array of
    packed 0xAARRGGBB pixels, length xsize*ysize. At level 0,
    ``transforms`` collects (type, data) records (inverted by the
    caller) and xsize may shrink via color-indexing bundling."""
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise WebpError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 2:               # SUBTRACT_GREEN
                transforms.append((2, None, xsize))
            elif ttype == 3:             # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal = _decode_entropy_image(br, n_colors, 1, False)
                pal = np.cumsum(
                    pal.view(np.uint8).reshape(-1, 4), axis=0,
                    dtype=np.uint32).astype(np.uint8)  # delta-coded
                pal = pal.copy().view(np.uint32).ravel()
                width_bits = (3 if n_colors <= 2 else
                              2 if n_colors <= 4 else
                              1 if n_colors <= 16 else 0)
                transforms.append((3, (pal, width_bits, xsize), xsize))
                xsize = _subsample(xsize, width_bits)
            else:                        # PREDICTOR / COLOR
                size_bits = br.read(3) + 2
                sub = _decode_entropy_image(
                    br, _subsample(xsize, size_bits),
                    _subsample(ysize, size_bits), False)
                transforms.append((ttype, (sub, size_bits), xsize))

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise WebpError(f"color cache bits {cache_bits} > 11")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):         # meta prefix codes
        meta_bits = br.read(3) + 2
        mw, mh = _subsample(xsize, meta_bits), _subsample(ysize, meta_bits)
        ent = _decode_entropy_image(br, mw, mh, False)
        meta = ((ent >> np.uint32(8)) & np.uint32(0xFFFF)).astype(np.int64)
        num_groups = int(meta.max()) + 1
        meta = meta.reshape(mh, mw)

    alph = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [[_read_prefix_code(br, a) for a in alph]
              for _ in range(num_groups)]

    # --- pixel loop: THE codec hot path. The bit buffer and the LUTs
    # are inlined as plain python ints/lists (same treatment as the
    # scalar Huffman loops in ops/jpeg.py / ops/gif.py): the
    # method-call version measured 3x slower on 196k symbol reads.
    total = xsize * ysize
    outl = [0] * total
    cache = [0] * cache_size if cache_size else None
    cshift = 32 - cache_bits if cache_bits else 0
    hmul = int(_HASH_MUL)

    def _unpack(t):
        return (t.single, None if t.single >= 0 else t.lut.tolist())

    gtables = [[_unpack(t) for t in g] for g in groups]
    (g_s, g_l), (r_s, r_l), (b_s, b_l), (a_s, a_l), (d_s, d_l) = gtables[0]
    data_b = br.data
    dpos = br.pos
    bitbuf = br.bitbuf
    nbits = br.nbits
    nd = br.n
    cur_group = 0
    pos = 0
    x = 0
    try:
        while pos < total:
            if meta is not None:
                gi = int(meta[(pos // xsize) >> meta_bits,
                              x >> meta_bits])
                if gi != cur_group:
                    if gi >= num_groups:
                        raise WebpError("meta prefix index out of range")
                    cur_group = gi
                    ((g_s, g_l), (r_s, r_l), (b_s, b_l), (a_s, a_l),
                     (d_s, d_l)) = gtables[gi]
            if g_s >= 0:
                s = g_s
            else:
                if nbits < 15:
                    while nbits <= 48 and dpos < nd:
                        bitbuf |= data_b[dpos] << nbits
                        dpos += 1
                        nbits += 8
                e = g_l[bitbuf & 0x7FFF]
                ln = e & 15
                if ln == 0:
                    raise WebpError("invalid prefix code word")
                bitbuf >>= ln
                nbits -= ln
                if nbits < 0:
                    raise WebpError("truncated VP8L stream")
                s = e >> 4
            if s < 256:                  # literal: red, blue, alpha
                rgb = [0, 0, 0]
                for ch, (t_s, t_l) in enumerate(
                        ((r_s, r_l), (b_s, b_l), (a_s, a_l))):
                    if t_s >= 0:
                        rgb[ch] = t_s
                        continue
                    if nbits < 15:
                        while nbits <= 48 and dpos < nd:
                            bitbuf |= data_b[dpos] << nbits
                            dpos += 1
                            nbits += 8
                    e = t_l[bitbuf & 0x7FFF]
                    ln = e & 15
                    if ln == 0:
                        raise WebpError("invalid prefix code word")
                    bitbuf >>= ln
                    nbits -= ln
                    if nbits < 0:
                        raise WebpError("truncated VP8L stream")
                    rgb[ch] = e >> 4
                px = (rgb[2] << 24) | (rgb[0] << 16) | (s << 8) | rgb[1]
                outl[pos] = px
                if cache is not None:
                    cache[((hmul * px) & 0xFFFFFFFF) >> cshift] = px
                pos += 1
                x += 1
                if x == xsize:
                    x = 0
            elif s < 280:                # LZ77 backward reference
                br.pos, br.bitbuf, br.nbits = dpos, bitbuf, nbits
                length = _prefix_value(s - 256, br)
                if d_s >= 0:
                    dsym = d_s
                else:                    # rare path: plain reader is fine
                    if br.nbits < 15:
                        br._fill()
                    e = d_l[br.bitbuf & 0x7FFF]
                    ln = e & 15
                    if ln == 0:
                        raise WebpError("invalid prefix code word")
                    br.skip(ln)
                    dsym = e >> 4
                dist_code = _prefix_value(dsym, br)
                dpos, bitbuf, nbits = br.pos, br.bitbuf, br.nbits
                dist = _plane_distance(dist_code, xsize)
                if dist > pos or pos + length > total:
                    raise WebpError("LZ77 reference out of bounds")
                src = pos - dist
                if dist >= length:       # non-overlapping: one slice
                    outl[pos:pos + length] = outl[src:src + length]
                else:                    # overlapping run
                    for i in range(length):
                        outl[pos + i] = outl[src + i]
                if cache is not None:
                    for px in outl[pos:pos + length]:
                        cache[((hmul * px) & 0xFFFFFFFF) >> cshift] = px
                pos += length
                x = pos % xsize
            else:                        # color cache hit
                if cache is None:
                    raise WebpError("cache symbol without a color cache")
                outl[pos] = cache[s - 280]
                pos += 1
                x += 1
                if x == xsize:
                    x = 0
    finally:
        # the parent stream (transforms, sibling images) reads on
        # after this image: sync the inlined cursor back
        br.pos, br.bitbuf, br.nbits = dpos, bitbuf, nbits
    return np.array(outl, np.uint32)


# ------------------------------------------------------------ transforms

def _avg2(a, b):
    return (a.astype(np.uint16) + b) >> 1


_T_ONLY_MODES = frozenset((0, 2, 3, 4, 8, 9))   # no left dependency


def _inv_predictor(px: np.ndarray, xsize: int, ysize: int,
                   sub: np.ndarray, size_bits: int) -> np.ndarray:
    """Inverse PREDICTOR transform: pixels were stored as deltas from a
    per-tile-selected prediction of already-reconstructed neighbors.
    Reconstruction is row-sequential; WITHIN a row, tiles whose mode
    depends only on the previous row (0/2/3/4/8/9) reconstruct as one
    vectorized segment, and only the left-dependent modes fall back to
    a per-pixel loop over plain python ints (the numpy-scalar-per-pixel
    version measured ~6 µs/px — this is what made 2 MP images take
    tens of seconds)."""
    modes = ((sub >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int64)
    mw = _subsample(xsize, size_bits)
    if int(modes.max()) > 13:
        raise WebpError(
            f"predictor mode {int(modes.max())} out of range")
    modes = modes.reshape(-1, mw)
    res = px.view(np.uint8).reshape(ysize, xsize, 4).astype(np.int32)
    out = np.empty((ysize, xsize, 4), np.int32)
    tile = 1 << size_bits
    for y in range(ysize):
        rrow = res[y]
        if y == 0:                       # (0,0) black, then L-scan
            lst = rrow.tolist()
            p = lst[0]
            p = [p[0] & 0xFF, p[1] & 0xFF, p[2] & 0xFF,
                 (p[3] + 255) & 0xFF]    # BGRA opaque black
            lst[0] = p
            for x in range(1, xsize):
                q = lst[x]
                p = [(q[0] + p[0]) & 0xFF, (q[1] + p[1]) & 0xFF,
                     (q[2] + p[2]) & 0xFF, (q[3] + p[3]) & 0xFF]
                lst[x] = p
            out[y] = lst
            continue
        mrow = modes[y >> size_bits]
        prev = out[y - 1]
        cur = out[y]
        # x == 0 is always T-predicted
        cur[0] = (rrow[0] + prev[0]) & 0xFF
        x = 1
        prev_lst = None
        cur_lst = None
        while x < xsize:
            m = int(mrow[x >> size_bits])
            x_end = min(((x >> size_bits) + 1) * tile, xsize)
            if m in _T_ONLY_MODES:
                T = prev[x:x_end]
                if m == 0:
                    pred = np.array([[0, 0, 0, 255]], np.int32)
                elif m == 2:
                    pred = T
                elif m == 3 or m == 9:
                    TR = prev[x + 1:x_end + 1]
                    if x_end == xsize:   # rightmost TR = cur row's
                        TR = np.concatenate([TR, cur[0:1]])  # first px
                    pred = TR if m == 3 else (T + TR) >> 1
                elif m == 4:
                    pred = prev[x - 1:x_end - 1]
                else:                    # 8
                    pred = (prev[x - 1:x_end - 1] + T) >> 1
                cur[x:x_end] = (rrow[x:x_end] + pred) & 0xFF
                cur_lst = None           # list view is stale now
                x = x_end
                continue
            # left-dependent modes: plain-python-int inner loop
            if prev_lst is None:
                prev_lst = prev.tolist()
            if cur_lst is None:
                cur_lst = cur.tolist()
            r_lst = rrow[x:x_end].tolist()
            Lp = cur_lst[x - 1]
            for i, q in enumerate(r_lst):
                xx = x + i
                T = prev_lst[xx]
                if m == 1:
                    pred = Lp
                elif m == 7:
                    pred = [(Lp[0] + T[0]) >> 1, (Lp[1] + T[1]) >> 1,
                            (Lp[2] + T[2]) >> 1, (Lp[3] + T[3]) >> 1]
                else:
                    TL = prev_lst[xx - 1]
                    TR = (prev_lst[xx + 1] if xx + 1 < xsize
                          else cur_lst[0])
                    if m == 5:
                        pred = [((((Lp[c] + TR[c]) >> 1) + T[c]) >> 1)
                                for c in range(4)]
                    elif m == 6:
                        pred = [(Lp[c] + TL[c]) >> 1 for c in range(4)]
                    elif m == 10:
                        pred = [((((Lp[c] + TL[c]) >> 1)
                                  + ((T[c] + TR[c]) >> 1)) >> 1)
                                for c in range(4)]
                    elif m == 11:        # Select
                        pl = pt = 0
                        for c in range(4):
                            pc = Lp[c] + T[c] - TL[c]
                            pl += abs(pc - Lp[c])
                            pt += abs(pc - T[c])
                        pred = Lp if pl < pt else T
                    elif m == 12:
                        pred = [min(255, max(0, Lp[c] + T[c] - TL[c]))
                                for c in range(4)]
                    else:                # 13 (C truncating /2)
                        pred = []
                        for c in range(4):
                            ave = (Lp[c] + T[c]) >> 1
                            d = ave - TL[c]
                            pred.append(min(255, max(
                                0, ave + ((d + (d < 0)) >> 1))))
                Lp = [(q[0] + pred[0]) & 0xFF, (q[1] + pred[1]) & 0xFF,
                      (q[2] + pred[2]) & 0xFF, (q[3] + pred[3]) & 0xFF]
                cur_lst[xx] = Lp
            cur[x:x_end] = cur_lst[x:x_end]
            x = x_end
    return np.ascontiguousarray(out.astype(np.uint8)).reshape(-1, 4) \
        .copy().view(np.uint32).ravel()


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Signed color-transform delta: (int8(t) * int8(c)) >> 5."""
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


def _inv_color_transform(px: np.ndarray, xsize: int, ysize: int,
                         sub: np.ndarray, size_bits: int) -> np.ndarray:
    mw = _subsample(xsize, size_bits)
    ys = np.arange(ysize) >> size_bits
    xs = np.arange(xsize) >> size_bits
    tiles = sub.reshape(-1, mw)[np.ix_(ys, xs)].ravel()   # per-pixel cte
    g2r = (tiles & np.uint32(0xFF)).astype(np.uint8)
    g2b = ((tiles >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
    r2b = ((tiles >> np.uint32(16)) & np.uint32(0xFF)).astype(np.uint8)
    v = px.view(np.uint8).reshape(-1, 4)                  # B G R A
    g = v[:, 1]
    red = (v[:, 2].astype(np.int32) + _ct_delta(g2r, g)) & 0xFF
    blue = (v[:, 0].astype(np.int32) + _ct_delta(g2b, g)) & 0xFF
    blue = (blue + _ct_delta(r2b, red.astype(np.uint8))) & 0xFF
    out = v.copy()
    out[:, 2] = red
    out[:, 0] = blue
    return out.view(np.uint32).ravel()


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    v = px.view(np.uint8).reshape(-1, 4).copy()           # B G R A
    g = v[:, 1].astype(np.uint16)
    v[:, 2] = (v[:, 2] + g) & 0xFF
    v[:, 0] = (v[:, 0] + g) & 0xFF
    return v.view(np.uint32).ravel()


def _inv_color_indexing(px: np.ndarray, ysize: int, pal: np.ndarray,
                        width_bits: int, full_xsize: int) -> np.ndarray:
    if width_bits:
        idx_per_byte = 1 << width_bits
        bits = 8 >> width_bits
        green = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint16)
        # unpack sub-byte indices LSB-first within each green byte
        shifts = (np.arange(idx_per_byte) * bits).astype(np.uint16)
        idx = (green[:, None] >> shifts[None, :]) & ((1 << bits) - 1)
        idx = idx.reshape(ysize, -1)[:, :full_xsize].ravel()
    else:
        idx = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int64)
    out = np.zeros(len(idx), np.uint32)
    ok = idx < len(pal)                  # out-of-range → transparent 0
    out[ok] = pal[idx[ok].astype(np.int64)]
    return out


# ------------------------------------------------------------- container

def _find_vp8l(payload: bytes) -> bytes:
    """RIFF walk → the VP8L chunk's bytes. Lossy VP8 raises the seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise WebpError("not a WebP payload (missing RIFF/WEBP)")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise WebpError("truncated WebP chunk")
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 boolean arithmetic coder) needs a "
                "codec library that is not in this container; lossless "
                "VP8L decodes natively")
        pos += 8 + size + (size & 1)     # chunks are 2-byte aligned
    raise WebpError("no VP8L chunk in WebP container")


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a LOSSLESS WebP to (h, w, 3) uint8 RGB (alpha dropped
    after composition — matching decode_png's RGB contract). Raises
    ``WebpError`` on malformed input and ``NotImplementedError`` for
    the lossy-VP8 seam."""
    br = _BitReader(_find_vp8l(payload))
    if br.read(8) != 0x2F:
        raise WebpError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                           # alpha hint
    if br.read(3) != 0:
        raise WebpError("unknown VP8L version")
    transforms: list = []
    px = _decode_entropy_image(br, w, h, True, transforms)
    for ttype, data, at_xsize in reversed(transforms):
        if ttype == 0:
            px = _inv_predictor(px, at_xsize, h, *data)
        elif ttype == 1:
            px = _inv_color_transform(px, at_xsize, h, *data)
        elif ttype == 2:
            px = _inv_subtract_green(px)
        else:
            px = _inv_color_indexing(px, h, *data)
    v = px.view(np.uint8).reshape(h, w, 4)       # little-endian: B G R A
    return np.ascontiguousarray(v[:, :, [2, 1, 0]])
