"""Baseline JPEG decoder (ops/jpeg.py) vs a self-contained test encoder.

The container has no codec library, so the tests carry their OWN
baseline JPEG encoder (T.81-conformant: FDCT, annex-F Huffman entropy
coding with canonical tables built from observed symbols, byte
stuffing, restart markers, 4:4:4 / 4:2:0 interleave). Any conformant
decoder must reconstruct its output to within quantization error —
that property (PSNR against the source raster) plus structural cases
(odd sizes, grayscale, restarts, subsampling, seams, truncation) pins
the decoder without golden binaries.
"""

import numpy as np
import pytest

from parquet_rs_ray.ops.jpeg import _A, _ZIGZAG, JpegError, decode_jpeg

# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0


def _cat(v: int) -> int:
    return int(abs(int(v))).bit_length()


def _mag(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _build_tables(used: set[int]):
    """Canonical table with every used symbol at 9 bits (≤ 255 symbols,
    so the all-ones code is never assigned): (counts16, syms, codemap)."""
    syms = sorted(used)
    assert len(syms) <= 255
    counts = [0] * 16
    counts[8] = len(syms)               # all length 9
    codes = {s: (i, 9) for i, s in enumerate(syms)}
    return bytes(counts), bytes(syms), codes


def _rgb_to_ycc(f: np.ndarray, half: float):
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = half - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = half + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [y, cb, cr]


def _prepare_blocks(img: np.ndarray, subsample: bool, qval: int,
                    prec: int = 8, transform: int | None = None):
    """FDCT + quantize + zigzag shared by both test encoders; returns
    (comp_blocks, h, w, qt, mcux, mcuy, hmax, vmax). 4-channel input
    is stored-domain (Adobe-inverted) CMYK; transform=2 routes the
    C'M'Y' channels through the YCbCr transform (YCCK)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    half = float(1 << (prec - 1))
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    elif img.shape[2] == 4:
        # transform None = bare CMYK (plain ink values, no APP14);
        # 0 = Adobe inverted CMYK; 2 = Adobe YCCK
        f = img.astype(np.float64)
        cmy = (_rgb_to_ycc(f[:, :, :3], half) if transform == 2
               else [f[:, :, 0], f[:, :, 1], f[:, :, 2]])
        planes = cmy + [f[:, :, 3]]
        samps = [(2, 2), (1, 1), (1, 1), (2, 2)] if subsample else \
            [(1, 1)] * 4
    elif transform == 0:        # Adobe "RGB stored" 3-component frame
        f = img.astype(np.float64)
        planes = [f[:, :, 0], f[:, :, 1], f[:, :, 2]]
        samps = [(1, 1), (1, 1), (1, 1)]
    else:
        planes = _rgb_to_ycc(img.astype(np.float64), half)
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else \
            [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qt = np.full(64, qval, np.int32)

    comp_blocks = []
    for plane, (ch, cv) in zip(planes, samps):
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        pad = np.empty((ph, pw))
        pad[:h, :w] = plane
        pad[h:, :w] = plane[-1:, :]     # edge-replicate padding
        pad[:, w:] = pad[:, w - 1:w]
        if (hmax // ch, vmax // cv) != (1, 1):
            fy, fx = vmax // cv, hmax // ch
            pad = pad.reshape(ph // fy, fy, pw // fx, fx).mean((1, 3))
        bh, bw = mcuy * cv, mcux * ch
        blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - half
        coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)
        q = np.rint(coef.reshape(-1, 64) / qt).astype(np.int64)
        zz = np.zeros_like(q)
        for k in range(64):
            zz[:, k] = q[:, _ZIGZAG[k]]
        comp_blocks.append((zz.reshape(bh, bw, 64), ch, cv, bw))
    return comp_blocks, h, w, qt, mcux, mcuy, hmax, vmax


def encode_jpeg(img: np.ndarray, *, subsample: bool = False,
                restart_interval: int = 0, qval: int = 4,
                prec: int = 8, transform: int | None = None) -> bytes:
    """Baseline/extended-sequential JPEG encoder (test oracle). ``img``
    is (h, w, 3) RGB, (h, w) grayscale, or (h, w, 4) stored-domain
    CMYK (``transform`` 0 or 2 selects plain CMYK vs YCCK and emits
    the Adobe APP14 marker); ``prec=12`` writes an SOF1 frame with
    16-bit DQT entries over uint16 samples in [0, 4095];
    ``subsample`` uses 4:2:0 luma 2×2."""
    comp_blocks, h, w, qt, mcux, mcuy, hmax, vmax = \
        _prepare_blocks(img, subsample, qval, prec, transform)

    def tokens():
        """(class, tid, symbol, magnitude, magbits) in scan order; DC
        predictors reset per restart segment like the decoder expects."""
        n_mcu = mcux * mcuy
        per = restart_interval or n_mcu
        pred = [0] * len(comp_blocks)
        for mcu in range(n_mcu):
            if mcu % per == 0:
                pred = [0] * len(comp_blocks)
                if mcu:
                    yield ("RST", (mcu // per - 1) & 7, 0, 0, 0)
            my, mx = divmod(mcu, mcux)
            for ci, (zz, ch, cv, bw) in enumerate(comp_blocks):
                tid = 0 if ci == 0 else 1
                for v in range(cv):
                    for hh in range(ch):
                        blk = zz[my * cv + v, mx * ch + hh]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        s = _cat(diff)
                        yield (0, tid, s, _mag(diff, s), s)
                        run = 0
                        nz = np.flatnonzero(blk[1:]) + 1
                        k = 1
                        for idx in nz:
                            run = int(idx) - k
                            while run >= 16:
                                yield (1, tid, 0xF0, 0, 0)
                                run -= 16
                            val = int(blk[idx])
                            s = _cat(val)
                            yield (1, tid, (run << 4) | s,
                                   _mag(val, s), s)
                            k = int(idx) + 1
                        if k <= 63:
                            yield (1, tid, 0x00, 0, 0)  # EOB

    used: dict[tuple, set] = {}
    for cls, tid, sym, _m, _s in tokens():
        if cls == "RST":
            continue
        used.setdefault((cls, tid), set()).add(sym)
    tables = {k: _build_tables(v) for k, v in used.items()}

    bw_ = _BitWriter()
    body = bytearray()
    for cls, tid, sym, mag, s in tokens():
        if cls == "RST":
            bw_.flush()
            body += bw_.out
            bw_.out = bytearray()
            body += bytes([0xFF, 0xD0 + tid])
            continue
        code, length = tables[(cls, tid)][2][sym]
        bw_.write(code, length)
        if s:
            bw_.write(mag, s)
    bw_.flush()
    body += bw_.out

    out = bytearray(b"\xff\xd8")
    nc = len(comp_blocks)
    if transform is not None:
        app14 = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
        out += b"\xff\xee" + (2 + len(app14)).to_bytes(2, "big") + app14
    if prec == 8:
        dqt_zz = bytes(int(qt[_ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + (2 + 65).to_bytes(2, "big") + b"\x00" + dqt_zz
    else:
        dqt_zz = b"".join(int(qt[_ZIGZAG[k]]).to_bytes(2, "big")
                          for k in range(64))
        out += b"\xff\xdb" + (2 + 129).to_bytes(2, "big") + b"\x10" + dqt_zz
    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for ci, (_z, ch, cv, _b) in enumerate(comp_blocks):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    sof_marker = b"\xff\xc0" if prec == 8 else b"\xff\xc1"
    out += sof_marker + (2 + len(sof)).to_bytes(2, "big") + sof
    for (cls, tid), (counts, syms, _c) in sorted(tables.items()):
        seg = bytes([(cls << 4) | tid]) + counts + syms
        out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") \
            + restart_interval.to_bytes(2, "big")
    sos = bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    out += body + b"\xff\xd9"
    return bytes(out)


def encode_progressive_jpeg(img: np.ndarray, *, subsample: bool = False,
                            qval: int = 4, prec: int = 8) -> bytes:
    """Progressive JPEG encoder (test oracle): SOF2 with a libjpeg-like
    scan script — interleaved DC first (Al=1) + DC refinement, per-
    component AC spectral bands at Al=2, then two AC refinement passes
    (Al=1, Al=0). Exercises EOB runs, ZRL-in-refinement, sign bits and
    interleaved correction bits (T.81 G.1.2). ``prec=12`` writes a
    12-bit frame (16-bit DQT entries) over uint16 samples."""
    comp_blocks, h, w, qt, mcux, mcuy, hmax, vmax = \
        _prepare_blocks(img, subsample, qval, prec)
    nc = len(comp_blocks)
    grids = []                            # per comp: (nbx, nby)
    for zz, ch, cv, bw in comp_blocks:
        nbx = -(-(-(-w * ch // hmax)) // 8)
        nby = -(-(-(-h * cv // vmax)) // 8)
        grids.append((nbx, nby))

    def dc_scan_blocks():
        """Blocks of the (interleaved if nc>1) DC scan, in scan order."""
        if nc == 1:
            zz, ch, cv, bw = comp_blocks[0]
            nbx, nby = grids[0]
            for by in range(nby):
                for bx in range(nbx):
                    yield 0, zz[by, bx]
        else:
            for mcu in range(mcux * mcuy):
                my, mx = divmod(mcu, mcux)
                for ci, (zz, ch, cv, bw) in enumerate(comp_blocks):
                    for v in range(cv):
                        for hh in range(ch):
                            yield ci, zz[my * cv + v, mx * ch + hh]

    def dc_first_tokens(al):
        toks = []
        pred = [0] * nc
        for ci, blk in dc_scan_blocks():
            tid = 0 if ci == 0 else 1
            dc = int(blk[0]) >> al        # arithmetic shift (T.81 G.1.1)
            diff = dc - pred[ci]
            pred[ci] = dc
            sz = _cat(diff)
            toks.append(("S", 0, tid, sz))
            if sz:
                toks.append(("B", _mag(diff, sz), sz))
        return toks

    def dc_refine_tokens(al):
        return [("B", (int(blk[0]) >> al) & 1, 1)
                for _ci, blk in dc_scan_blocks()]

    def ac_first_tokens(ci, ss, se, al):
        zz, ch, cv, bw = comp_blocks[ci]
        nbx, nby = grids[ci]
        tid = 0 if ci == 0 else 1
        toks = []
        for by in range(nby):
            for bx in range(nbx):
                blk = zz[by, bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    a = abs(v) >> al
                    if a == 0:
                        r += 1
                        continue
                    while r >= 16:
                        toks.append(("S", 1, tid, 0xF0))
                        r -= 16
                    sv = a if v >= 0 else -a
                    sz = _cat(sv)
                    toks.append(("S", 1, tid, (r << 4) | sz))
                    toks.append(("B", _mag(sv, sz), sz))
                    r = 0
                if r > 0:
                    toks.append(("S", 1, tid, 0x00))     # EOB0
        return toks

    def ac_refine_tokens(ci, ss, se, ah, al):
        zz, ch, cv, bw = comp_blocks[ci]
        nbx, nby = grids[ci]
        tid = 0 if ci == 0 else 1
        toks = []
        for by in range(nby):
            for bx in range(nbx):
                blk = zz[by, bx]
                a = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                eob = max((i for i, v in enumerate(a) if v == 1),
                          default=-1)
                r = 0
                br_bits = []
                for i, av in enumerate(a):
                    if av == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob:
                        toks.append(("S", 1, tid, 0xF0))
                        r -= 16
                        toks.extend(("B", b, 1) for b in br_bits)
                        br_bits = []
                    if av > 1:            # history-nonzero: correction bit
                        br_bits.append(av & 1)
                        continue
                    # newly-nonzero: symbol, sign, then buffered bits
                    toks.append(("S", 1, tid, (r << 4) | 1))
                    toks.append(("B", 1 if int(blk[ss + i]) >= 0 else 0, 1))
                    toks.extend(("B", b, 1) for b in br_bits)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    toks.append(("S", 1, tid, 0x00))     # EOB0
                    toks.extend(("B", b, 1) for b in br_bits)
        return toks

    # scan script (header fields, token list)
    all_comps = list(range(nc))
    scans = [((all_comps, 0, 0, 0, 1), dc_first_tokens(1))]
    for ci in all_comps:
        scans.append((([ci], 1, 5, 0, 2), ac_first_tokens(ci, 1, 5, 2)))
    for ci in all_comps:
        scans.append((([ci], 6, 63, 0, 2), ac_first_tokens(ci, 6, 63, 2)))
    for ci in all_comps:
        scans.append((([ci], 1, 63, 2, 1),
                      ac_refine_tokens(ci, 1, 63, 2, 1)))
    for ci in all_comps:
        scans.append((([ci], 1, 63, 1, 0),
                      ac_refine_tokens(ci, 1, 63, 1, 0)))
    scans.append(((all_comps, 0, 0, 1, 0), dc_refine_tokens(0)))

    used: dict[tuple, set] = {}
    for _hdr, toks in scans:
        for t in toks:
            if t[0] == "S":
                used.setdefault((t[1], t[2]), set()).add(t[3])
    tables = {k: _build_tables(v) for k, v in used.items()}

    out = bytearray(b"\xff\xd8")
    if prec == 8:
        dqt_zz = bytes(int(qt[_ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + (2 + 65).to_bytes(2, "big") + b"\x00" + dqt_zz
    else:
        dqt_zz = b"".join(int(qt[_ZIGZAG[k]]).to_bytes(2, "big")
                          for k in range(64))
        out += b"\xff\xdb" + (2 + 129).to_bytes(2, "big") + b"\x10" + dqt_zz
    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for ci, (_z, ch, cv, _b) in enumerate(comp_blocks):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc2" + (2 + len(sof)).to_bytes(2, "big") + sof
    for (cls, tid), (counts, syms, _c) in sorted(tables.items()):
        seg = bytes([(cls << 4) | tid]) + counts + syms
        out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
    for (comps_in, ss, se, ah, al), toks in scans:
        sos = bytes([len(comps_in)])
        for ci in comps_in:
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
        bw_ = _BitWriter()
        for t in toks:
            if t[0] == "S":
                code, length = tables[(t[1], t[2])][2][t[3]]
                bw_.write(code, length)
            else:
                bw_.write(t[1], t[2])
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def _smooth(h, w, seed=0):
    """Low-frequency test image (JPEG-friendly: quantization error
    stays small, so PSNR cleanly separates correct from broken)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 90 * np.sin(xx / 17 + c) * np.cos(yy / 23 - c)
        + rng.normal(0, 2, (h, w))
        for c in range(3)], axis=2)
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


# ------------------------------------------------------------------- tests


def test_roundtrip_444_color():
    img = _smooth(64, 48)
    got = decode_jpeg(encode_jpeg(img))
    assert got.shape == img.shape
    assert _psnr(img, got) > 32, _psnr(img, got)


def test_roundtrip_odd_dimensions():
    img = _smooth(17, 13, seed=1)
    got = decode_jpeg(encode_jpeg(img))
    assert got.shape == (17, 13, 3)
    assert _psnr(img, got) > 32


def test_roundtrip_grayscale():
    img = _smooth(40, 40, seed=2)[:, :, 0]
    got = decode_jpeg(encode_jpeg(img))
    assert got.shape == (40, 40, 3)
    assert (got[:, :, 0] == got[:, :, 1]).all()
    assert _psnr(np.repeat(img[:, :, None], 3, 2), got) > 32


def test_roundtrip_420_subsampled():
    img = _smooth(64, 64, seed=3)
    got = decode_jpeg(encode_jpeg(img, subsample=True))
    assert got.shape == img.shape
    # chroma is 2x2-averaged; luma fidelity still bounds overall error
    assert _psnr(img, got) > 28


def test_restart_markers_reset_predictors():
    img = _smooth(48, 80, seed=4)
    enc = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    got = decode_jpeg(enc)
    base = decode_jpeg(encode_jpeg(img))
    assert (got == base).all()  # restarts change framing, not pixels


def test_decode_is_deterministic_golden():
    img = _smooth(32, 32, seed=5)
    import hashlib
    d1 = decode_jpeg(encode_jpeg(img))
    d2 = decode_jpeg(encode_jpeg(img))
    assert hashlib.blake2b(d1.tobytes()).digest() == \
        hashlib.blake2b(d2.tobytes()).digest()


def test_seams_and_truncation_raise():
    img = _smooth(16, 16, seed=6)
    enc = bytearray(encode_jpeg(img))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC9                   # arithmetic coding: the seam
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    enc2 = encode_jpeg(img)
    with pytest.raises(JpegError):
        decode_jpeg(enc2[: len(enc2) // 2])
    with pytest.raises(JpegError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_progressive_roundtrip_444():
    img = _smooth(64, 48, seed=20)
    enc = encode_progressive_jpeg(img)
    got = decode_jpeg(enc)
    assert got.shape == img.shape
    assert _psnr(img, got) > 32, _psnr(img, got)
    # progressive and baseline decode the SAME quantized coefficients,
    # so the reconstructions must be bit-identical
    base = decode_jpeg(encode_jpeg(img))
    assert (got == base).all()


def test_progressive_roundtrip_odd_and_gray():
    img = _smooth(17, 13, seed=21)
    got = decode_jpeg(encode_progressive_jpeg(img))
    assert (got == decode_jpeg(encode_jpeg(img))).all()
    g = _smooth(23, 31, seed=22)[:, :, 0]
    got = decode_jpeg(encode_progressive_jpeg(g))
    assert (got == decode_jpeg(encode_jpeg(g))).all()


def test_progressive_roundtrip_420_subsampled():
    # 4:2:0 makes the AC scans run on a chroma block grid narrower than
    # the MCU-padded plane — exercises the non-interleaved geometry
    img = _smooth(56, 72, seed=23)
    got = decode_jpeg(encode_progressive_jpeg(img, subsample=True))
    assert (got == decode_jpeg(encode_jpeg(img, subsample=True))).all()


def test_progressive_sparse_and_extreme_blocks():
    # near-flat image: almost all AC zero -> EOB-run paths dominate;
    # plus a few hot pixels to force ZRL inside refinement scans
    img = np.full((40, 40, 3), 128, np.uint8)
    img[3, 5] = (255, 0, 255)
    img[20, 20] = (0, 255, 0)
    img[39, 39] = (255, 255, 255)
    got = decode_jpeg(encode_progressive_jpeg(img, qval=2))
    base = decode_jpeg(encode_jpeg(img, qval=2))
    assert (got == base).all()


def test_progressive_truncated_scan_raises():
    """A cut INSIDE a scan's entropy data is a typed error (the phantom
    zero-bit cap fires); a cut BETWEEN scans decodes the prefix — that
    partial-render property is what progressive JPEG is for."""
    img = _smooth(32, 32, seed=24)
    enc = encode_progressive_jpeg(img)
    first_sos = enc.index(b"\xff\xda")
    with pytest.raises(JpegError):
        decode_jpeg(enc[: first_sos + 20])   # mid-DC-scan entropy
    # prefix ending exactly at the next SOS: DC-only preview decodes
    second_sos = enc.index(b"\xff\xda", first_sos + 2)
    out = decode_jpeg(enc[:second_sos])
    assert out.shape == img.shape


def test_decode_image_bytes_sniffs_jpeg():
    from parquet_rs_ray.ops.multimodal import decode_image_bytes
    img = _smooth(40, 56, seed=7)
    out = decode_image_bytes(encode_jpeg(img), (20, 28))
    assert out.shape == (20, 28, 3)
    with pytest.raises(NotImplementedError):  # webp stays the seam
        decode_image_bytes(
            b"RIFF\x10\x00\x00\x00WEBP"
            b"VP8 \x04\x00\x00\x00\x00\x00\x00\x00", (8, 8))


def test_decode_image_pipeline_with_jpeg(ray_session):
    """End-to-end actor-pool decode over a jpeg binary column."""
    import pyarrow as pa
    import ray
    from parquet_rs_ray.ops.multimodal import DecodeImage
    payloads = [encode_jpeg(_smooth(24 + 8 * i, 32, seed=i))
                for i in range(6)]
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "media": pa.array(payloads, pa.binary())})
    out = ray.data.from_arrow(tbl).map_batches(
        DecodeImage, fn_constructor_kwargs={"target_hw": (16, 16)},
        batch_format="pyarrow", batch_size=3, concurrency=2) \
        .to_pandas().sort_values("doc_id")
    assert list(out["height"]) == [16] * 6
    assert list(out["channels"]) == [3] * 6
    assert out["pixel_checksum"].nunique() == 6


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(st.data(), st.sampled_from([(8, 8), (9, 7), (16, 24), (31, 18)]),
       st.booleans(), st.integers(1, 6))
def test_progressive_equals_baseline_property(data, hw, subsample, qval):
    """Progressive and baseline code the SAME quantized coefficients,
    so any conformant decode of both must be bit-identical — a strong
    invariant over random content (incl. hard noise, not just smooth
    images)."""
    h, w = hw
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample=subsample, qval=qval))
    prog = decode_jpeg(
        encode_progressive_jpeg(img, subsample=subsample, qval=qval))
    assert (prog == base).all()


def test_roundtrip_12bit_grayscale_and_color():
    """12-bit extended sequential (SOF1, 16-bit DQT, DC cats >11):
    decode reconstructs in the native range then round-shifts to the
    uint8 contract — compare against the same shift of the source."""
    rng = np.random.default_rng(30)
    yy, xx = np.mgrid[0:40, 0:56]
    g12 = np.clip(2048 + 1500 * np.sin(xx / 15) * np.cos(yy / 19)
                  + rng.normal(0, 20, (40, 56)), 0, 4095).astype(np.uint16)
    got = decode_jpeg(encode_jpeg(g12, prec=12, qval=8))
    want8 = np.minimum((g12.astype(np.int32) + 8) >> 4, 255)
    assert got.dtype == np.uint8 and got.shape == (40, 56, 3)
    assert _psnr(np.repeat(want8[:, :, None], 3, 2), got) > 32
    c12 = np.stack([np.clip(2048 + 1500 * np.sin(xx / (13 + 4 * c))
                            * np.cos(yy / (17 + 3 * c)), 0, 4095)
                    for c in range(3)], axis=2).astype(np.uint16)
    got = decode_jpeg(encode_jpeg(c12, prec=12, qval=8))
    want8 = np.minimum((c12.astype(np.int32) + 8) >> 4, 255)
    assert _psnr(want8, got) > 30


def test_roundtrip_cmyk_and_ycck():
    """4-component Adobe CMYK (transform 0) and YCCK (transform 2):
    the decoder composites stored-domain samples against white
    (R = C'·K'/255). Both transforms must land on the same RGB."""
    rng = np.random.default_rng(31)
    yy, xx = np.mgrid[0:48, 0:40]
    cmyk = np.stack([np.clip(128 + 100 * np.sin(xx / (11 + 3 * c))
                             * np.cos(yy / (14 + 2 * c))
                             + rng.normal(0, 2, (48, 40)), 0, 255)
                     for c in range(4)], axis=2).astype(np.uint8)
    want = np.clip(np.rint(
        cmyk[:, :, :3].astype(np.float64)
        * (cmyk[:, :, 3:].astype(np.float64) / 255.0)), 0, 255)
    got_cmyk = decode_jpeg(encode_jpeg(cmyk, transform=0))
    got_ycck = decode_jpeg(encode_jpeg(cmyk, transform=2))
    assert got_cmyk.shape == (48, 40, 3)
    assert _psnr(want, got_cmyk) > 32, _psnr(want, got_cmyk)
    assert _psnr(want, got_ycck) > 32, _psnr(want, got_ycck)
    assert _psnr(got_cmyk, got_ycck) > 35   # same image, two routes


def test_cmyk_subsampled_and_restart():
    rng = np.random.default_rng(32)
    cmyk = np.clip(rng.normal(128, 30, (32, 48, 4)), 0, 255) \
        .astype(np.uint8)
    base = decode_jpeg(encode_jpeg(cmyk, transform=2))
    sub = decode_jpeg(encode_jpeg(cmyk, transform=2, subsample=True))
    assert sub.shape == base.shape
    rst = decode_jpeg(encode_jpeg(cmyk, transform=2, restart_interval=2))
    assert (rst == base).all()


def test_progressive_12bit_equals_baseline():
    """12-bit progressive and 12-bit extended-sequential code the same
    quantized coefficients — reconstructions must be bit-identical
    (exercises DC categories >11 through the progressive DC scans)."""
    rng = np.random.default_rng(35)
    img = rng.integers(0, 4096, (24, 40, 3)).astype(np.uint16)
    prog = decode_jpeg(encode_progressive_jpeg(img, prec=12, qval=8))
    base = decode_jpeg(encode_jpeg(img, prec=12, qval=8))
    assert (prog == base).all()


def test_rgb_stored_3component_adobe_transform0():
    """Adobe APP14 transform 0 on a 3-component frame means the planes
    ARE R, G, B — no YCbCr matrix. A decoder that ignores the flag
    scrambles colors."""
    img = _smooth(32, 24, seed=33)
    got = decode_jpeg(encode_jpeg(img, transform=0))
    assert _psnr(img, got) > 32, _psnr(img, got)
    # and it is NOT the (wrong) YCbCr interpretation of those planes
    ycc_misread = decode_jpeg(
        encode_jpeg(img, transform=0)
        .replace(b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]),
                 b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 1])))
    assert _psnr(got, ycc_misread) < 25


def test_bare_cmyk_without_app14_is_plain_ink():
    """4-component frame with NO Adobe marker: plain (uninverted) ink
    values — libjpeg's bare-CMYK assumption. R = (255−C)(255−K)/255."""
    rng = np.random.default_rng(34)
    yy, xx = np.mgrid[0:32, 0:40]
    ink = np.stack([np.clip(100 + 60 * np.sin(xx / (9 + 2 * c))
                            * np.cos(yy / (12 + c))
                            + rng.normal(0, 2, (32, 40)), 0, 255)
                    for c in range(4)], axis=2).astype(np.uint8)
    enc = encode_jpeg(ink, transform=None)
    assert b"Adobe" not in enc
    want = np.clip(np.rint(
        (255.0 - ink[:, :, :3].astype(np.float64))
        * ((255.0 - ink[:, :, 3:].astype(np.float64)) / 255.0)), 0, 255)
    got = decode_jpeg(enc)
    assert _psnr(want, got) > 32, _psnr(want, got)


def test_bad_app14_transform_raises():
    cmyk = np.full((16, 16, 4), 128, np.uint8)
    enc = bytearray(encode_jpeg(cmyk, transform=0))
    i = enc.index(b"Adobe")
    enc[i + 11] = 1                 # YCbCr flag invalid for 4 comps
    with pytest.raises(JpegError):
        decode_jpeg(bytes(enc))


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker; the
    decoder must skip them instead of misparsing segment lengths."""
    base = encode_jpeg(_smooth(16, 16))
    # pad before EOI and before the first segment after SOI
    assert base[-2:] == b"\xff\xd9"
    padded = base[:2] + b"\xff" * 3 + base[2:-2] + b"\xff\xff" + b"\xff\xd9"
    got = decode_jpeg(padded)
    want = decode_jpeg(base)
    np.testing.assert_array_equal(got, want)
