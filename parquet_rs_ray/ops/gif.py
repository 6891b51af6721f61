"""GIF decode in pure numpy + a bounded-table LZW loop — no codec
library (GIF87a/GIF89a, CompuServe spec; the remaining common web
image format after ops/jpeg.py and ops/png.py).

Coverage: global/local color tables, interlaced images (4-pass row
order), GIF89a graphic-control extensions (transparency index,
disposal methods none/keep/background/previous), multi-frame
animations composed on a canvas, sub-block chains, unknown extensions
skipped structurally. LZW is the variable-width 3..12-bit variant with
CLEAR/EOI, KwKwK, frozen-table streams past 4096 entries, and the
interoperable width-bump rule (decoder bumps when the entry count
reaches 2^width — giflib/PIL timing, one code behind the encoder's
2^width+1 by construction of the one-step entry lag).

Output contract matches the JPEG/PNG paths: (h, w, 3) uint8 RGB, no
alpha — transparent pixels keep the canvas underneath (black before
any paint). ``decode_gif`` returns the first composed frame;
``gif_frames`` yields every composed frame for temporal sampling;
``count_frames`` is a structural scan (no LZW work) so a sampler can
pick frame indices before decoding anything.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "gif_frames", "count_frames", "GifError"]

_MAX_CODES = 4096
# interlace passes: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifError(ValueError):
    pass


# ------------------------------------------------------------ structure

def _screen(data: bytes):
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a",
                                                                  b"9a"):
        raise GifError("not a GIF87a/GIF89a stream")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if off + 3 * n > len(data):
            raise GifError("truncated global color table")
        gct = np.frombuffer(data, np.uint8, 3 * n, off).reshape(n, 3)
        off += 3 * n
    return w, h, gct, off


def _skip_subblocks(data: bytes, off: int) -> int:
    while True:
        if off >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[off]
        off += 1 + n
        if n == 0:
            return off
        if off > len(data):
            raise GifError("truncated sub-block")


def _subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if off >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        if off + n > len(data):
            raise GifError("truncated sub-block")
        parts.append(data[off:off + n])
        off += n


def _iter_blocks(data: bytes, off: int):
    """Yield ('gce', dict) and ('img', dict) blocks until trailer."""
    gce = None
    while True:
        if off >= len(data):
            raise GifError("missing trailer")
        b = data[off]
        off += 1
        if b == 0x3B:                      # trailer
            return
        if b == 0x21:                      # extension
            if off >= len(data):
                raise GifError("truncated extension")
            label = data[off]
            off += 1
            if label == 0xF9:              # graphic control
                blk, off = _subblocks(data, off)
                if len(blk) < 4:
                    raise GifError("short graphic-control block")
                flags = blk[0]
                gce = {"disposal": (flags >> 2) & 0x7,
                       "transparent": blk[3] if flags & 1 else None}
            else:                          # comment/app/plain-text: skip
                off = _skip_subblocks(data, off)
            continue
        if b == 0x2C:                      # image descriptor
            if off + 9 > len(data):
                raise GifError("truncated image descriptor")
            x, y, w, h, flags = struct.unpack_from("<HHHHB", data, off)
            off += 9
            lct = None
            if flags & 0x80:
                n = 2 << (flags & 0x07)
                if off + 3 * n > len(data):
                    raise GifError("truncated local color table")
                lct = np.frombuffer(data, np.uint8, 3 * n,
                                    off).reshape(n, 3)
                off += 3 * n
            if off >= len(data):
                raise GifError("truncated image data")
            mcs = data[off]
            lzw, off = _subblocks(data, off + 1)
            yield "img", {"x": x, "y": y, "w": w, "h": h,
                          "interlaced": bool(flags & 0x40), "lct": lct,
                          "mcs": mcs, "lzw": lzw,
                          "gce": gce}
            gce = None
            continue
        raise GifError(f"unknown block id 0x{b:02x}")


def count_frames(data: bytes) -> int:
    """Structural frame count — skips LZW payloads, decodes nothing."""
    _w, _h, _gct, off = _screen(data)
    return sum(1 for kind, _ in _iter_blocks(data, off) if kind == "img")


# ------------------------------------------------------------------ LZW

def _lzw_decode(lzw: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW → exactly ``n_pixels`` uint8 indices (extra
    trailing codes are ignored, fewer raise)."""
    if not 2 <= mcs <= 11:
        raise GifError(f"bad LZW min code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = np.unpackbits(np.frombuffer(lzw, np.uint8),
                         bitorder="little")
    pow2 = 1 << np.arange(12)
    out = bytearray()
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > len(bits):
            return -1
        v = int(bits[pos:pos + width] @ pow2[:width])
        pos += width
        return v

    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = mcs + 1
    prev = None
    while len(out) < n_pixels:
        code = read(width)
        if code < 0:
            raise GifError("LZW stream truncated mid-image")
        if code == clear:
            table = list(roots)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:      # KwKwK
            entry = prev + prev[:1]
        else:
            raise GifError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < _MAX_CODES:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise GifError(f"image data ends after {len(out)} of "
                       f"{n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    rows = np.concatenate([np.arange(first, h, step)
                           for first, step in _INTERLACE if first < h]) \
        if h else np.arange(0)
    out = np.empty_like(idx)
    out[rows] = idx
    return out


# ------------------------------------------------------------- compose

def gif_frames(data: bytes):
    """Yield each composed animation frame as (h, w, 3) uint8 RGB.
    Transparent pixels keep whatever the canvas holds (black before
    any paint — the no-alpha contract of the JPEG/PNG paths);
    disposal: 0/1 keep, 2 clears the frame rect to black, 3 restores
    the pre-frame canvas."""
    w, h, gct, off = _screen(data)
    canvas = np.zeros((h, w, 3), np.uint8)
    for kind, img in _iter_blocks(data, off):
        if kind != "img":
            continue
        ct = img["lct"] if img["lct"] is not None else gct
        if ct is None:
            raise GifError("image has neither local nor global "
                           "color table")
        fw, fh = img["w"], img["h"]
        if img["x"] + fw > w or img["y"] + fh > h:
            raise GifError("frame rect outside logical screen")
        idx = _lzw_decode(img["lzw"], img["mcs"],
                          fw * fh).reshape(fh, fw)
        if img["interlaced"]:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(ct):
            raise GifError("pixel index outside color table")
        gce = img["gce"] or {}
        disposal = gce.get("disposal", 0)
        before = canvas.copy() if disposal == 3 else None
        rect = canvas[img["y"]:img["y"] + fh, img["x"]:img["x"] + fw]
        rgb = ct[idx]
        t = gce.get("transparent")
        if t is None:
            rect[:] = rgb
        else:
            opaque = idx != t
            rect[opaque] = rgb[opaque]
        yield canvas.copy()
        if disposal == 2:
            rect[:] = 0
        elif disposal == 3:
            canvas = before


def decode_gif(data: bytes) -> np.ndarray:
    """First composed frame as (h, w, 3) uint8 RGB."""
    for frame in gif_frames(data):
        return frame
    raise GifError("GIF contains no image")
