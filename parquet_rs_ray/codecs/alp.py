"""ALP — adaptive lossless floating-point encoding for FLOAT/DOUBLE
columns (Afroozeh & Boncz, "ALP: Adaptive Lossless floating-Point
compression", SIGMOD 2024 — public; SURVEY §2.12-class north-star
addition like FSST/FOR/BSS, absent from the reference's v0.4 enum).

Most real-world doubles are decimals (prices, scores, percentages,
rounded measurements). For a chunk we pick ONE decimal exponent ``e``
and store each value as the integer ``d = round(v * 10^e)`` —
frame-of-reference + bit-packed via the existing FOR codec — iff the
value survives the exact *decode expression* ``d / 10^e``
bit-identically (verified at encode time with the very same
expression, so decode is exact by construction; division, not
multiply-by-inverse — IEEE division is correctly rounded, so every
decimal whose digit fits decodes to its nearest-float exactly, where
``d * nearest(10^-e)`` double-rounds and rejects most of them). Values that don't
roundtrip (NaN/±inf, -0.0, true mantissa noise, |d| overflow) are
stored verbatim as positioned exceptions. A 2-decimal price column
drops from 64 bits/value to ~bit_width(max_cents - min_cents), and
unlike BYTE_STREAM_SPLIT the win is in RAW bytes, so ALP pays off
with or without an outer block codec.

Layout: vlq(num_values) u8(e) vlq(len(digits)) digits:FOR
        vlq(n_exc) vlq(len(pos)) pos:FOR(int64) exc_raw(n_exc × width)

Exceptions' digit slots are filled with the valid-digit minimum so
they never widen the FOR bit width.
"""

from __future__ import annotations

import numpy as np

from ..bitio import decode_vlq, encode_vlq, pack_bits
from . import forpack
from .base import PhysicalType

CODEC_ID = "ALP"

# decimal exponents worth probing: beyond these, 10^e itself loses
# integer precision in the respective float type
_MAX_E = {PhysicalType.DOUBLE: 18, PhysicalType.FLOAT: 10}
# |digit| bound, clear of the int64/int32 edge
_LIM = {PhysicalType.DOUBLE: 4.6e18, PhysicalType.FLOAT: 2.0e9}

_E64 = 10.0 ** np.arange(19)
_E32 = (10.0 ** np.arange(11)).astype(np.float32)

_SAMPLE = 512


def _tables(phys):
    if phys == PhysicalType.DOUBLE:
        return (_E64, np.uint64, np.float64, np.int64,
                _MAX_E[phys], _LIM[phys])
    if phys == PhysicalType.FLOAT:
        return (_E32, np.uint32, np.float32, np.int32,
                _MAX_E[phys], _LIM[phys])
    raise ValueError(f"ALP supports FLOAT/DOUBLE, not {phys}")


def _exact_mask(v, e, E, udt, idt, lim):
    """Bitwise-exact roundtrip mask + the integer digits. The check
    routes through the INTEGER digit exactly as decode will (a float
    check would wrongly accept -0.0, whose digit 0 decodes to +0.0)."""
    with np.errstate(invalid="ignore", over="ignore"):
        d = np.round(v * E[e])
        ok = np.isfinite(d) & (np.abs(d) < lim)
        di = np.where(ok, d, 0).astype(idt)
        dec = di.astype(v.dtype) / E[e]
    exact = ok & (dec.view(udt) == v.view(udt))
    return exact, di


def _pick_e(v, E, udt, idt, max_e, lim):
    """Exponent maximizing exact coverage on a sample; ties prefer the
    smaller e (smaller digits → narrower FOR bit width)."""
    s = v[:_SAMPLE]
    best_e, best_cnt = 0, -1
    for e in range(max_e + 1):
        cnt = int(_exact_mask(s, e, E, udt, idt, lim)[0].sum())
        if cnt > best_cnt:
            best_e, best_cnt = e, cnt
        if best_cnt == len(s):          # perfect at the smallest e:
            break                       # larger e can only tie bigger
    return best_e, best_cnt / max(1, len(s))


def encode(values: np.ndarray, phys) -> bytes:
    E, udt, fdt, idt, max_e, lim = _tables(phys)
    v = np.ascontiguousarray(values, dtype=fdt)
    n = len(v)
    if n == 0:
        db0 = forpack.encode(np.zeros(0, idt),
                             phys == PhysicalType.FLOAT)
        return (encode_vlq(0) + b"\x00" + encode_vlq(len(db0)) + db0
                + encode_vlq(0) + encode_vlq(0))
    e, _ = _pick_e(v, E, udt, idt, max_e, lim)
    exact, di = _exact_mask(v, e, E, udt, idt, lim)
    exc_pos = np.flatnonzero(~exact).astype(np.int64)
    digits = np.where(exact, di, 0).astype(idt)
    if len(exc_pos):
        fill = digits[exact].min() if exact.any() else idt(0)
        digits[~exact] = fill
    db = forpack.encode(digits, phys == PhysicalType.FLOAT)
    pb = forpack.encode(exc_pos, False) if len(exc_pos) else b""
    exc_raw = v[exc_pos].tobytes()
    return (encode_vlq(n) + bytes([e]) + encode_vlq(len(db)) + db
            + encode_vlq(len(exc_pos)) + encode_vlq(len(pb)) + pb
            + exc_raw)


def encode_or_none(values: np.ndarray, phys) -> bytes | None:
    """Selector probe: None when the sample says ALP can't cover
    enough values to beat the 8-or-4-byte PLAIN floor — too many
    exceptions (each costs position + verbatim value), or a degenerate
    large-e "success" whose digits FoR-pack as wide as PLAIN itself
    (noise floats DO roundtrip x·10^18/10^18 most of the time, but
    with ~62-bit digits there is nothing to win — that regime belongs
    to ALP-RD)."""
    from ..bitio import num_required_bits

    E, udt, fdt, idt, max_e, lim = _tables(phys)
    v = np.ascontiguousarray(values, dtype=fdt)
    if len(v) == 0:
        return None
    e, frac = _pick_e(v, E, udt, idt, max_e, lim)
    if frac < 0.75:
        return None
    exact, di = _exact_mask(v[:_SAMPLE], e, E, udt, idt, lim)
    if exact.any():
        d = di[exact]
        span = int(d.max()) - int(d.min())
        if num_required_bits(span) >= v.dtype.itemsize * 8 - 4:
            return None
    return encode(v, phys)


def decode(data: bytes, num_values: int, phys) -> np.ndarray:
    E, udt, fdt, idt, _max_e, _lim = _tables(phys)
    buf = memoryview(data)
    n, off = decode_vlq(buf, 0)
    e = buf[off]
    off += 1
    dblen, off = decode_vlq(buf, off)
    digits = forpack.decode(bytes(buf[off:off + dblen]),
                            phys == PhysicalType.FLOAT)
    off += dblen
    n_exc, off = decode_vlq(buf, off)
    pblen, off = decode_vlq(buf, off)
    # the identical expression verified at encode time — exact by
    # construction (int→float exact for integral float digits;
    # correctly-rounded division, not multiply-by-inverse)
    out = digits.astype(fdt) / E[e]
    if n_exc:
        pos = forpack.decode(bytes(buf[off:off + pblen]), False)
        off += pblen
        exc = np.frombuffer(buf, dtype=fdt, count=n_exc, offset=off)
        out[pos] = exc
    if len(out) != n:
        raise ValueError(f"ALP header says {n} values, digits decode "
                         f"to {len(out)}")
    return out


# ----------------------------------------------------------------- ALP-RD
# The paper's second scheme, for "real doubles" the decimal model can't
# cover (scientific values, embeddings): split every float's BIT pattern
# at position r into a left part (sign/exponent/top mantissa, ≤16 bits —
# highly repetitive across a chunk) and a right part (low mantissa,
# noise). Right bits store verbatim bit-packed; left parts
# dictionary-code against the ≤8 most frequent values, the rest as
# positioned u16 exceptions. UNCONDITIONALLY lossless — no per-value
# verification needed, every bit is either stored or dictionary-mapped.
#
# Layout: vlq(n) u8(r) u8(k) k×u16 dict
#         vlq(len) left codes bit-packed at ceil(log2 k)
#         vlq(len) right parts bit-packed at r
#         vlq(n_exc) vlq(len) pos:FOR(int64) n_exc×u16 exc left values

RD_CODEC_ID = "ALP_RD"
_RD_MAX_DICT = 8


def _rd_plan(bits_u: np.ndarray, width: int):
    """Pick (r, dict) minimizing estimated bits/value on a sample."""
    s = bits_u[:_SAMPLE]
    best = None
    for r in range(width - 16, width):
        left = (s >> np.uint64(r)).astype(np.uint64)
        vals, cnt = np.unique(left, return_counts=True)
        order = np.argsort(cnt)[::-1][:_RD_MAX_DICT]
        dic = vals[order]
        covered = int(cnt[order].sum())
        k = len(dic)
        lb = max(1, int(np.ceil(np.log2(max(k, 2)))))
        est = len(s) * (lb + r) + (len(s) - covered) * (16 + 24)
        if best is None or est < best[0]:
            best = (est, r, dic)
    _est, r, dic = best
    return r, np.sort(dic).astype(np.uint64), _est / max(1, len(s))


def encode_rd(values: np.ndarray, phys) -> bytes:
    _E, udt, fdt, _idt, _max_e, _lim = _tables(phys)
    v = np.ascontiguousarray(values, dtype=fdt)
    width = v.dtype.itemsize * 8
    n = len(v)
    if n == 0:
        return (encode_vlq(0) + bytes([width - 1, 0]) + encode_vlq(0)
                + encode_vlq(0) + encode_vlq(0) + encode_vlq(0))
    bits_u = v.view(udt).astype(np.uint64)
    r, dic, _bpv = _rd_plan(bits_u, width)
    left = bits_u >> np.uint64(r)
    right = bits_u & np.uint64((1 << r) - 1)
    pos_in_dict = np.searchsorted(dic, left)
    pos_in_dict = np.minimum(pos_in_dict, len(dic) - 1)
    hit = dic[pos_in_dict] == left
    codes = np.where(hit, pos_in_dict, 0).astype(np.uint64)
    lb = max(1, int(np.ceil(np.log2(max(len(dic), 2)))))
    exc_pos = np.flatnonzero(~hit).astype(np.int64)
    lp = pack_bits(codes, lb)
    rp = pack_bits(right, r)
    pb = forpack.encode(exc_pos, False) if len(exc_pos) else b""
    out = (encode_vlq(n) + bytes([r, len(dic)])
           + dic.astype("<u2").tobytes()
           + encode_vlq(len(lp)) + lp + encode_vlq(len(rp)) + rp
           + encode_vlq(len(exc_pos)) + encode_vlq(len(pb)) + pb
           + left[exc_pos].astype("<u2").tobytes())
    return out


def encode_rd_or_none(values: np.ndarray, phys) -> bytes | None:
    """Selector probe: None unless the sample-estimated bits/value
    beats PLAIN (the estimate is pessimistic — it books exceptions at
    40 bits while positions FoR-pack tighter — and the selector's
    PLAIN floor re-checks the real encoded size anyway)."""
    _E, udt, fdt, _idt, _max_e, _lim = _tables(phys)
    v = np.ascontiguousarray(values, dtype=fdt)
    if len(v) == 0:
        return None
    width = v.dtype.itemsize * 8
    _r, _dic, bpv = _rd_plan(v.view(udt).astype(np.uint64), width)
    if bpv >= width:
        return None
    return encode_rd(v, phys)


def decode_rd(data: bytes, num_values: int, phys) -> np.ndarray:
    from ..bitio import unpack_bits

    _E, udt, fdt, _idt, _max_e, _lim = _tables(phys)
    buf = memoryview(data)
    n, off = decode_vlq(buf, 0)
    r, k = buf[off], buf[off + 1]
    off += 2
    dic = np.frombuffer(buf, "<u2", count=k, offset=off).astype(np.uint64)
    off += 2 * k
    lplen, off = decode_vlq(buf, off)
    lb = max(1, int(np.ceil(np.log2(max(k, 2))))) if k else 0
    codes = unpack_bits(bytes(buf[off:off + lplen]), lb, n)
    off += lplen
    rplen, off = decode_vlq(buf, off)
    right = unpack_bits(bytes(buf[off:off + rplen]), r, n)
    off += rplen
    n_exc, off = decode_vlq(buf, off)
    pblen, off = decode_vlq(buf, off)
    left = dic[np.minimum(codes, max(k - 1, 0))] if k else \
        np.zeros(n, np.uint64)
    if n_exc:
        pos = forpack.decode(bytes(buf[off:off + pblen]), False)
        off += pblen
        exc = np.frombuffer(buf, "<u2", count=n_exc,
                            offset=off).astype(np.uint64)
        left[pos] = exc
    bits = (left << np.uint64(r)) | right
    if phys == PhysicalType.FLOAT:
        return bits.astype(np.uint32).view(np.float32)
    return bits.view(np.float64)
