"""Lossless WebP / VP8L decode (ops/webp.py): bit-exact roundtrips
against an INDEPENDENT test-side VP8L encoder (written from the public
bitstream spec, sharing no code with the decoder), covering the full
feature grid — simple and normal prefix-code transports, LZ77 copies
(near-map and far distances), the color cache, meta prefix codes, and
all four transforms (predictor modes 0-13, color transform,
subtract-green, palette indexing with sub-byte bundling)."""

import struct

import numpy as np
import pytest

from parquet_rs_ray.ops.webp import WebpError, decode_webp

# --------------------------------------------------------------------
# independent encoder (spec-derived; no imports from ops/webp.py)
# --------------------------------------------------------------------


class _BW:
    """LSB-first bit writer."""

    def __init__(self):
        self.bits = 0
        self.n = 0
        self.out = bytearray()

    def w(self, value, nbits):
        assert 0 <= value < (1 << nbits) or nbits == 0
        self.bits |= value << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.bits & 0xFF)
            self.bits >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.bits & 0xFF)
            self.bits, self.n = 0, 0
        return bytes(self.out)


def _huff_lengths(freqs, max_len):
    """Code lengths from frequencies (plain Huffman; inputs in these
    tests never exceed the limit — asserted)."""
    alive = [(f, [s]) for s, f in enumerate(freqs) if f > 0]
    if len(alive) == 1:
        return {alive[0][1][0]: 1}
    depth = {s: 0 for _, (f, ss) in enumerate(alive) for s in ss}
    import heapq
    heap = [(f, i, ss) for i, (f, ss) in enumerate(alive)]
    heapq.heapify(heap)
    uid = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, s1 + s2))
        uid += 1
    assert max(depth.values()) <= max_len, "test fixture too deep"
    return depth


def _canon_codes(lengths_by_sym):
    """Canonical (code, len) per symbol — (length, symbol) order."""
    codes = {}
    code = 0
    prev = None
    for ln, s in sorted((ln, s) for s, ln in lengths_by_sym.items()):
        if prev is None:
            prev = ln
        code <<= (ln - prev)
        prev = ln
        codes[s] = (code, ln)
        code += 1
    return codes


def _w_code(bw, codes, sym):
    code, ln = codes[sym]
    bw.w(int(f"{code:0{ln}b}"[::-1], 2) if ln else 0, ln)  # MSB-first


def _emit_prefix_code(bw, freqs, alphabet_size):
    """Emit one prefix code (simple if <=2 symbols, else normal with a
    literal code-length-code: no repeat codes, no max_symbol cap).
    Returns symbol→(code,len)."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    if len(used) == 0:
        used = [0]
        freqs = [1] + list(freqs[1:])
    if len(used) <= 2:
        bw.w(1, 1)                        # simple
        bw.w(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            bw.w(0, 1)                    # 1-bit first symbol
            bw.w(used[0], 1)
        else:
            bw.w(1, 1)                    # 8-bit first symbol
            bw.w(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.w(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    lengths = _huff_lengths(freqs, 15)
    seq = [lengths.get(s, 0) for s in range(max(used) + 1)]
    # code-length code over the distinct length values (literals only)
    cl_freq = [0] * 19
    for v in seq:
        cl_freq[v] += 1
    cl_len = _huff_lengths(cl_freq, 7)
    if len(cl_len) == 1:                  # degenerate: pad a dummy
        only = next(iter(cl_len))
        cl_len = {only: 1, (only + 1) % 16: 1}
    cl_codes = _canon_codes(cl_len)
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)
    # num_code_lengths must cover every used cl symbol's order position
    need = max(order.index(s) for s in cl_len) + 1
    num = max(need, 4)
    bw.w(0, 1)                            # normal
    bw.w(num - 4, 4)
    for i in range(num):
        bw.w(cl_len.get(order[i], 0), 3)
    # explicit max_symbol cap so trailing zeros need not be emitted
    bw.w(1, 1)
    length_nbits = 14                     # 2 + 2*6
    bw.w(6, 3)
    bw.w(len(seq) - 2, length_nbits)
    for v in seq:
        _w_code(bw, cl_codes, v)
    return _canon_codes(lengths)


def _prefix_encode_value(v):
    """value ≥ 1 → (prefix_code, extra_bits_value, extra_bits_count)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    b = x.bit_length() - 1
    half = (x >> (b - 1)) & 1
    code = 2 * b + half
    offset = (2 + half) << (b - 1)
    return code, x - offset, b - 1


_HASH_MUL = 0x1E35A7BD


def encode_vp8l(rgb, *, subtract_green=False, predictor=None,
                color_transform=None, palette=False, cache_bits=0,
                lz77=False, meta_split=False, alpha=None):
    """Independent VP8L encoder: ARGB literals + optional features.
    ``predictor`` = (mode, size_bits) applied uniformly; a color
    transform is one (g2r, g2b, r2b) element for the whole image."""
    h, w = rgb.shape[:2]
    a = np.full((h, w), 255, np.uint8) if alpha is None else alpha
    px = [[(int(a[y, x]), int(rgb[y, x, 0]), int(rgb[y, x, 1]),
            int(rgb[y, x, 2])) for x in range(w)] for y in range(h)]

    bw = _BW()
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0 if alpha is None else 1, 1)
    bw.w(0, 3)

    xsize = w
    # ---- transforms (read order = application order reversed at decode)
    if predictor is not None:
        mode, size_bits = predictor
        bw.w(1, 1)
        bw.w(0, 2)
        bw.w(size_bits - 2, 3)
        mw = (xsize + (1 << size_bits) - 1) >> size_bits
        mh = (h + (1 << size_bits) - 1) >> size_bits
        _encode_sub_image(bw, [[(255, 0, mode, 0)] * mw] * mh)
        # forward transform: residual = pixel - pred (mod 256)
        res = [[None] * w for _ in range(h)]
        for y in range(h):
            for x in range(w):
                res[y][x] = _pred_residual(px, x, y, w, mode, size_bits)
        px = res
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.w(1, 1)
        bw.w(1, 2)
        size_bits = 3
        bw.w(size_bits - 2, 3)
        mw = (xsize + 7) >> 3
        mh = (h + 7) >> 3
        _encode_sub_image(bw, [[(255, r2b, g2b, g2r)] * mw] * mh)

        def s8(v):
            return v - 256 if v >= 128 else v

        def delta(t, c):
            return (s8(t) * s8(c & 0xFF)) >> 5

        out = []
        for row in px:
            orow = []
            for (pa, pr, pg, pb) in row:
                nr = (pr - delta(g2r, pg)) & 0xFF
                nb = (pb - delta(g2b, pg)) & 0xFF
                nb = (nb - delta(r2b, pr)) & 0xFF  # ORIGINAL red: the
                # inverse adds delta(r2b, reconstructed_red) == pr
                orow.append((pa, nr, pg, nb))
            out.append(orow)
        px = out
    if subtract_green:
        bw.w(1, 1)
        bw.w(2, 2)
        px = [[(pa, (pr - pg) & 0xFF, pg, (pb - pg) & 0xFF)
               for (pa, pr, pg, pb) in row] for row in px]
    if palette:
        colors = sorted({p for row in px for p in row})
        n = len(colors)
        assert n <= 256
        lookup = {c: i for i, c in enumerate(colors)}
        bw.w(1, 1)
        bw.w(3, 2)
        bw.w(n - 1, 8)
        deltas = []
        prev = (0, 0, 0, 0)
        for c in colors:
            deltas.append(tuple((c[i] - prev[i]) & 0xFF for i in range(4)))
            prev = c
        _encode_sub_image(bw, [deltas])
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            packed = []
            for row in px:
                prow = []
                for i in range(0, w, per):
                    gval = 0
                    for j, p in enumerate(row[i:i + per]):
                        gval |= lookup[p] << (j * bits)
                    prow.append((255, 0, gval, 0))
                packed.append(prow)
            px = packed
            xsize = len(packed[0])
        else:
            px = [[(255, 0, lookup[p], 0) for p in row] for row in px]
    bw.w(0, 1)                            # no more transforms

    flat = [p for row in px for p in row]
    _encode_main_image(bw, flat, xsize, h, cache_bits=cache_bits,
                       lz77=lz77, meta_split=meta_split)
    stream = bw.done()
    body = stream + (b"\x00" if len(stream) % 2 else b"")
    riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(stream)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(stream)) + body[:len(stream)]
            + (b"\x00" if len(stream) % 2 else b""))
    return riff


def _pred_residual(px, x, y, w, mode, size_bits):
    pa, pr, pg, pb = px[y][x]
    if x == 0 and y == 0:
        pred = (255, 0, 0, 0)
    elif y == 0:
        pred = px[0][x - 1]
    elif x == 0:
        pred = px[y - 1][0]
    else:
        L = px[y][x - 1]
        T = px[y - 1][x]
        TL = px[y - 1][x - 1]
        TR = px[y - 1][x + 1] if x + 1 < w else px[y][0]
        if mode == 0:
            pred = (255, 0, 0, 0)
        elif mode == 1:
            pred = L
        elif mode == 2:
            pred = T
        elif mode == 3:
            pred = TR
        elif mode == 4:
            pred = TL
        elif mode == 5:
            pred = tuple((((L[i] + TR[i]) // 2) + T[i]) // 2
                         for i in range(4))
        elif mode == 7:
            pred = tuple((L[i] + T[i]) // 2 for i in range(4))
        elif mode == 11:
            p = [L[i] + T[i] - TL[i] for i in range(4)]
            pl = sum(abs(p[i] - L[i]) for i in range(4))
            pt = sum(abs(p[i] - T[i]) for i in range(4))
            pred = L if pl < pt else T
        elif mode == 12:
            pred = tuple(min(255, max(0, L[i] + T[i] - TL[i]))
                         for i in range(4))
        elif mode == 13:
            pred = []
            for i in range(4):
                ave = (L[i] + T[i]) // 2
                d = ave - TL[i]
                half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc
                pred.append(min(255, max(0, ave + half)))
            pred = tuple(pred)
        else:
            raise AssertionError(f"fixture predictor mode {mode}")
    return tuple((v - q) & 0xFF
                 for v, q in zip((pa, pr, pg, pb), pred))


def _encode_sub_image(bw, rows):
    """Entropy-coded subsidiary image (no transforms / meta): literal
    pixels only."""
    flat = [p for row in rows for p in row]
    _encode_main_image(bw, flat, len(rows[0]), len(rows), cache_bits=0,
                       lz77=False, meta_split=False, is_sub=True)


def _encode_main_image(bw, flat, xsize, ysize, *, cache_bits, lz77,
                       meta_split, is_sub=False):
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    def argb32(p):
        return (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]

    # tokens: ('lit', a, r, g, b) / ('cache', i) / ('copy', len, dist)
    tokens = []
    i = 0
    n = len(flat)
    while i < n:
        p = flat[i]
        if lz77 and i > 0 and flat[i - 1] == p:
            run = 1
            while i + run < n and flat[i + run] == p:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                if cache_size:
                    ci = ((_HASH_MUL * argb32(p)) & 0xFFFFFFFF) \
                        >> (32 - cache_bits)
                    cache[ci] = argb32(p)
                i += run
                continue
        if cache_size:
            ci = ((_HASH_MUL * argb32(p)) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[ci] == argb32(p):
                tokens.append(("cache", ci))
                i += 1
                continue
            cache[ci] = argb32(p)
        tokens.append(("lit",) + p)
        i += 1

    groups = 1
    meta_bits = 0
    if meta_split:
        # two horizontal tiles sharing one code set each (identical
        # trees built from global frequencies — exercises the group
        # SELECTION machinery, which is what the decoder must get right)
        meta_bits = max(2, (xsize // 2).bit_length())
        while (xsize + (1 << meta_bits) - 1) >> meta_bits < 2:
            meta_bits -= 1
        meta_bits = max(meta_bits, 2)
        groups = 2

    # frequencies (both groups share trees in the meta case)
    gf = [0] * (256 + 24 + cache_size)
    rf = [0] * 256
    bf = [0] * 256
    af = [0] * 256
    df = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            _, pa, pr, pg, pb = t
            gf[pg] += 1
            rf[pr] += 1
            bf[pb] += 1
            af[pa] += 1
        elif t[0] == "cache":
            gf[280 + t[1]] += 1
        else:
            code, _, _ = _prefix_encode_value(t[1])
            gf[256 + code] += 1
            dcode, _, _ = _prefix_encode_value(t[2] and 2)  # dist 1→code 2
            df[dcode] += 1

    bw.w(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.w(cache_bits, 4)
    if not is_sub:
        bw.w(1 if meta_split else 0, 1)
        if meta_split:
            bw.w(meta_bits - 2, 3)
            mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
            mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
            rows = [[(255, 0, 0 if x < (mw + 1) // 2 else 1, 0)
                     for x in range(mw)] for _ in range(mh)]
            _encode_sub_image(bw, rows)

    all_codes = []
    for _ in range(groups):
        gc = _emit_prefix_code(bw, gf, 256 + 24 + cache_size)
        rc = _emit_prefix_code(bw, rf, 256)
        bc = _emit_prefix_code(bw, bf, 256)
        ac = _emit_prefix_code(bw, af, 256)
        dc = _emit_prefix_code(bw, df, 40)
        all_codes.append((gc, rc, bc, ac, dc))

    pos = 0
    for t in tokens:
        x = pos % xsize
        gi = 0
        if meta_split:
            mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
            gi = 0 if (x >> meta_bits) < (mw + 1) // 2 else 1
        gc, rc, bc, ac, dc = all_codes[gi]
        if t[0] == "lit":
            _, pa, pr, pg, pb = t
            _w_code(bw, gc, pg)
            _w_code(bw, rc, pr)
            _w_code(bw, bc, pb)
            _w_code(bw, ac, pa)
            pos += 1
        elif t[0] == "cache":
            _w_code(bw, gc, 280 + t[1])
            pos += 1
        else:
            code, extra, nbits = _prefix_encode_value(t[1])
            _w_code(bw, gc, 256 + code)
            bw.w(extra, nbits)
            dcode, dextra, dnbits = _prefix_encode_value(2)  # plane dist 1
            _w_code(bw, dc, dcode)
            bw.w(dextra, dnbits)
            pos += t[1]


# --------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------

def _gradient(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = (np.arange(h)[:, None, None] * 7
            + np.arange(w)[None, :, None] * 11
            + np.arange(3)[None, None, :] * 37) % 256
    noise = rng.integers(0, 40, (h, w, 3))
    return ((base + noise) % 256).astype(np.uint8)


def _blocky(h, w, k=4, seed=5):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
    idx = rng.integers(0, k, (h, w))
    img = pal[idx]
    img[2:6, 1:9] = img[2, 1]            # a duplicated run for LZ77
    return img


# --------------------------------------------------------------------
# tests
# --------------------------------------------------------------------

def test_literals_roundtrip_bit_exact():
    img = _gradient(13, 17)
    assert np.array_equal(decode_webp(encode_vp8l(img)), img)


def test_simple_codes_tiny_image():
    img = np.zeros((3, 5, 3), np.uint8)
    img[..., 1] = 200                    # two distinct symbols per tree
    img[1, 2] = (9, 7, 3)
    assert np.array_equal(decode_webp(encode_vp8l(img)), img)


def test_one_pixel_image():
    img = np.array([[[1, 2, 3]]], np.uint8)
    assert np.array_equal(decode_webp(encode_vp8l(img)), img)


def test_subtract_green_roundtrip():
    img = _gradient(9, 12, seed=8)
    enc = encode_vp8l(img, subtract_green=True)
    assert np.array_equal(decode_webp(enc), img)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 7, 11, 12, 13])
def test_predictor_modes_roundtrip(mode):
    img = _gradient(11, 14, seed=mode + 20)
    enc = encode_vp8l(img, predictor=(mode, 3))
    assert np.array_equal(decode_webp(enc), img)


def test_predictor_plus_subtract_green():
    img = _gradient(10, 10, seed=77)
    enc = encode_vp8l(img, predictor=(2, 2), subtract_green=True)
    assert np.array_equal(decode_webp(enc), img)


@pytest.mark.parametrize("cte", [(0, 0, 0), (37, 250, 129), (128, 1, 255)])
def test_color_transform_roundtrip(cte):
    img = _gradient(8, 9, seed=sum(cte))
    enc = encode_vp8l(img, color_transform=cte)
    assert np.array_equal(decode_webp(enc), img)


@pytest.mark.parametrize("k", [2, 4, 13, 40])
def test_palette_roundtrip_with_bundling(k):
    img = _blocky(12, 19, k=k)
    enc = encode_vp8l(img, palette=True)
    assert np.array_equal(decode_webp(enc), img)


def test_palette_width_not_multiple_of_bundle():
    img = _blocky(7, 13, k=2)            # 8 indices/byte, 13 % 8 != 0
    enc = encode_vp8l(img, palette=True)
    assert np.array_equal(decode_webp(enc), img)


def test_lz77_runs_roundtrip():
    img = _blocky(16, 16, k=3, seed=9)
    img[5:9] = img[5, 0]                 # long run rows
    enc = encode_vp8l(img, lz77=True)
    assert np.array_equal(decode_webp(enc), img)


@pytest.mark.parametrize("cache_bits", [1, 4, 11])
def test_color_cache_roundtrip(cache_bits):
    img = _blocky(14, 14, k=5, seed=11)
    enc = encode_vp8l(img, cache_bits=cache_bits)
    assert np.array_equal(decode_webp(enc), img)


def test_cache_plus_lz77():
    img = _blocky(20, 20, k=4, seed=13)
    enc = encode_vp8l(img, cache_bits=6, lz77=True)
    assert np.array_equal(decode_webp(enc), img)


def test_meta_prefix_groups():
    img = _gradient(16, 32, seed=15)
    enc = encode_vp8l(img, meta_split=True)
    assert np.array_equal(decode_webp(enc), img)


def test_alpha_is_decoded_then_dropped():
    img = _gradient(6, 6, seed=21)
    alpha = np.full((6, 6), 77, np.uint8)
    enc = encode_vp8l(img, alpha=alpha)
    assert np.array_equal(decode_webp(enc), img)  # RGB contract


def test_lossy_vp8_raises_named_seam():
    payload = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
               + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_webp(payload)


def test_corrupt_inputs_raise_typed():
    img = _gradient(5, 5)
    good = bytearray(encode_vp8l(img))
    with pytest.raises(WebpError):
        decode_webp(b"RIFX" + bytes(good[4:]))
    with pytest.raises(WebpError):
        decode_webp(bytes(good[:25]))    # truncated stream
    bad = bytearray(good)
    bad[21] ^= 0xFF                      # flip header-adjacent bits
    try:
        decode_webp(bytes(bad))          # either decodes to something
    except (WebpError, NotImplementedError):
        pass                             # or raises typed — never hangs


def test_dispatch_through_decode_image_bytes():
    from parquet_rs_ray.ops.multimodal import decode_image_bytes

    img = _gradient(10, 8, seed=30)
    out = decode_image_bytes(encode_vp8l(img), (10, 8))
    assert np.array_equal(out, img)


def test_code_length_repeat_codes_16_17_18():
    """The repeat-code transport (16 = repeat previous nonzero length)
    — not emitted by the encoder above, so exercised bit-by-bit:
    alphabet 8, lengths [2,2,2,2,3,3,3,3] written as two literals and
    two repeat-16 runs."""
    from parquet_rs_ray.ops.webp import _BitReader, _read_prefix_code

    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)
    cl = {2: 1, 3: 2, 16: 2}            # Kraft 1/2+1/4+1/4 = 1
    cl_codes = _canon_codes(cl)
    bw = _BW()
    bw.w(0, 1)                          # normal transport
    bw.w(15, 4)                         # num_code_lengths = 19
    for s in order:
        bw.w(cl.get(s, 0), 3)
    bw.w(0, 1)                          # no max_symbol cap
    _w_code(bw, cl_codes, 3)            # sym0 := 3
    _w_code(bw, cl_codes, 16)           # repeat prev(3) 3+0 → syms1-3
    bw.w(0, 2)
    _w_code(bw, cl_codes, 16)           # back-to-back repeat: 3+1 more
    bw.w(1, 2)                          # (prev stays the last LITERAL)
    tree = _read_prefix_code(_BitReader(bw.done()), 8)
    want_lengths = {s: 3 for s in range(8)}   # Kraft 8/8 = 1
    codes = _canon_codes(want_lengths)
    bw2 = _BW()
    for s in range(8):
        _w_code(bw2, codes, s)
    br = _BitReader(bw2.done())
    assert [tree.read(br) for _ in range(8)] == list(range(8))


def test_zero_run_codes_17_18():
    from parquet_rs_ray.ops.webp import _BitReader, _read_prefix_code

    # alphabet 32: sym0 len1, syms1-3 zero (17), sym4 len2, syms5-15
    # zero (18), sym16 len3, sym17 len3  → Kraft 1/2+1/4+1/8+1/8 = 1
    cl = {1: 2, 2: 2, 3: 2, 17: 3, 18: 3}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)
    codes = _canon_codes(cl)
    bw = _BW()
    bw.w(0, 1)
    bw.w(15, 4)
    for s in order:
        bw.w(cl.get(s, 0), 3)
    bw.w(1, 1)                 # max_symbol cap counts code-length READS
    bw.w(6, 3)                 # length_nbits = 14
    bw.w(6 - 2, 14)            # exactly the 6 reads below
    _w_code(bw, codes, 1)      # sym0 len1
    _w_code(bw, codes, 17)     # 3+0 zeros → syms1-3
    bw.w(0, 3)
    _w_code(bw, codes, 2)      # sym4 len2
    _w_code(bw, codes, 18)     # 11+0 zeros → syms5-15
    bw.w(0, 7)
    _w_code(bw, codes, 3)      # sym16 len3
    _w_code(bw, codes, 3)      # sym17 len3
    tree = _read_prefix_code(_BitReader(bw.done()), 32)
    want = {0: 1, 4: 2, 16: 3, 17: 3}
    enc = _canon_codes(want)
    bw2 = _BW()
    for s in (0, 4, 16, 17, 0):
        _w_code(bw2, enc, s)
    br = _BitReader(bw2.done())
    assert [tree.read(br) for _ in range(5)] == [0, 4, 16, 17, 0]


def test_distance_map_spec_samples():
    from parquet_rs_ray.ops.webp import _plane_distance

    xs = 32
    assert _plane_distance(1, xs) == xs          # (0,1)
    assert _plane_distance(2, xs) == 1           # (1,0)
    assert _plane_distance(3, xs) == xs + 1      # (1,1)
    assert _plane_distance(4, xs) == xs - 1      # (-1,1)
    assert _plane_distance(121, xs) == 1         # > map: dist-120
    assert _plane_distance(120 + 999, xs) == 999
    # negative-dx entries clamp to >= 1 on narrow images
    assert _plane_distance(4, 1) == 1            # 1*1 + (-1) = 0 → 1


def test_vertical_copy_distance():
    """A copy with plane distance = xsize (map entry (0,1)) replays the
    previous row — handcrafted stream, exercises the 2D distance map
    end to end."""
    w, h = 6, 4
    row = [(255, i * 9 % 256, i * 17 % 256, i * 5 % 256)
           for i in range(w)]
    bw = _BW()
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(0, 1)                 # no transforms
    _encode_with_vertical_copies(bw, row, w, h)
    stream = bw.done()
    riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(stream)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(stream)) + stream
            + (b"\x00" if len(stream) % 2 else b""))
    out = decode_webp(riff)
    want = np.array([[p[1:] for p in row]] * h, np.uint8)
    assert np.array_equal(out, want)


def _encode_with_vertical_copies(bw, row, w, h):
    """First row literal, remaining rows one big copy at plane
    distance w (dist_code 1 → map entry (0,1))."""
    gf = [0] * 280
    rf = [0] * 256
    bf = [0] * 256
    af = [0] * 256
    df = [0] * 40
    for (pa, pr, pg, pb) in row:
        gf[pg] += 1
        rf[pr] += 1
        bf[pb] += 1
        af[pa] += 1
    total_copy = w * (h - 1)
    lcode, lextra, lbits = _prefix_encode_value(total_copy)
    gf[256 + lcode] += 1
    dcode, dextra, dbits = _prefix_encode_value(1)   # dist_code 1
    df[dcode] += 1
    bw.w(0, 1)                 # no cache
    bw.w(0, 1)                 # no meta
    gc = _emit_prefix_code(bw, gf, 280)
    rc = _emit_prefix_code(bw, rf, 256)
    bc = _emit_prefix_code(bw, bf, 256)
    ac = _emit_prefix_code(bw, af, 256)
    dc = _emit_prefix_code(bw, df, 40)
    for (pa, pr, pg, pb) in row:
        _w_code(bw, gc, pg)
        _w_code(bw, rc, pr)
        _w_code(bw, bc, pb)
        _w_code(bw, ac, pa)
    _w_code(bw, gc, 256 + lcode)
    bw.w(lextra, lbits)
    _w_code(bw, dc, dcode)
    bw.w(dextra, dbits)
