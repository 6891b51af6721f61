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

from ..bitio import decode_vlq, encode_vlq
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
    enough values to beat the 8-or-4-byte PLAIN floor (each exception
    costs position + verbatim value, ~1.5× PLAIN)."""
    E, udt, fdt, idt, max_e, lim = _tables(phys)
    v = np.ascontiguousarray(values, dtype=fdt)
    if len(v) == 0:
        return None
    e, frac = _pick_e(v, E, udt, idt, max_e, lim)
    if frac < 0.75:
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
