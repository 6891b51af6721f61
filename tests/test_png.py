"""PNG decoder (ops/png.py): PNG is lossless, so the test encoder
(stdlib zlib + crc32, per-row filter choice) pins BIT-EXACT roundtrips
for every color type and every filter type — no PSNR tolerance."""

import struct
import zlib

import numpy as np
import pytest

from parquet_rs_ray.ops.png import PngError, decode_png

# ------------------------------------------------------------------ encoder


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data \
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)


def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return int(a)
    return int(b) if pb <= pc else int(c)


def _filter_row(f: int, cur: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    n = len(c)
    out = np.zeros(n, np.int32)
    for x in range(n):
        a = c[x - bpp] if x >= bpp else 0
        b = p[x]
        cc = p[x - bpp] if x >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, cc)
        out[x] = (c[x] - pred) & 0xFF
    return out.astype(np.uint8)


def _byte_rows(img: np.ndarray, depth: int) -> np.ndarray:
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    samples = img.reshape(h, w * ch)
    if depth == 16:
        raw = samples.astype(">u2").tobytes()
        return np.frombuffer(raw, np.uint8).reshape(h, w * ch * 2)
    if depth < 8:
        bits = ((samples[:, :, None] >> np.arange(depth - 1, -1, -1))
                & 1).reshape(h, w * ch * depth).astype(np.uint8)
        return np.packbits(bits, axis=1)
    return samples.astype(np.uint8)


def _filter_body(rows: np.ndarray, bpp: int, filters) -> bytearray:
    body = bytearray()
    prev = np.zeros(rows.shape[1], np.uint8)
    for y in range(rows.shape[0]):
        f = filters[y % len(filters)]
        body.append(f)
        body += _filter_row(f, rows[y], prev, bpp).tobytes()
        prev = rows[y]
    return body


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def encode_png(img: np.ndarray, *, color: int, depth: int = 8,
               filters=None, palette: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """Minimal PNG encoder (test oracle). ``img``: (h, w, ch) uint8 (or
    uint16 when depth=16); ``filters``: per-row filter type (default
    cycles 0..4 to exercise every unfilter kernel); ``interlace``
    emits the 7 Adam7 passes, each filtered independently."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    bpp = max(1, ch * depth // 8)       # filter distance floor (RFC 2083)
    filters = filters if filters is not None else list(range(5))
    if interlace:
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += _filter_body(_byte_rows(sub, depth), bpp, filters)
    else:
        body = _filter_body(_byte_rows(img, depth), bpp, filters)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color,
                                       0, 0, int(interlace)))
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    comp = zlib.compress(bytes(body), 6)
    # split IDAT to exercise multi-chunk reassembly
    mid = len(comp) // 2
    out += _chunk(b"IDAT", comp[:mid])
    out += _chunk(b"IDAT", comp[mid:])
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _img(h, w, ch, seed=0, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    hi = 255 if dtype == np.uint8 else 65535
    a = rng.integers(0, hi + 1, (h, w, ch) if ch > 1 else (h, w))
    return a.astype(dtype)


# ------------------------------------------------------------------- tests


def test_rgb_roundtrip_every_filter_bit_exact():
    img = _img(23, 17, 3, seed=1)   # odd dims; rows cycle filters 0-4
    got = decode_png(encode_png(img, color=2))
    assert (got == img).all()


def test_single_filter_types_bit_exact():
    img = _img(12, 9, 3, seed=2)
    for f in range(5):
        got = decode_png(encode_png(img, color=2, filters=[f] * 12))
        assert (got == img).all(), f"filter {f}"


def test_grayscale_and_gray_alpha():
    g = _img(10, 14, 1, seed=3)
    got = decode_png(encode_png(g, color=0))
    assert (got[:, :, 0] == g).all() and (got[:, :, 1] == g).all()
    ga = _img(10, 14, 2, seed=4)
    got = decode_png(encode_png(ga, color=4))
    assert (got[:, :, 0] == ga[:, :, 0]).all()  # alpha dropped


def test_rgba_drops_alpha_bit_exact():
    img = _img(8, 8, 4, seed=5)
    got = decode_png(encode_png(img, color=6))
    assert (got == img[:, :, :3]).all()


def test_palette_roundtrip():
    rng = np.random.default_rng(6)
    palette = rng.integers(0, 256, (200, 3)).astype(np.uint8)
    idx = rng.integers(0, 200, (15, 11)).astype(np.uint8)
    got = decode_png(encode_png(idx, color=3, palette=palette))
    assert (got == palette[idx]).all()
    # out-of-range index is a typed error, not garbage pixels
    bad_idx = np.full((4, 4), 201, np.uint8)
    with pytest.raises(PngError):
        decode_png(encode_png(bad_idx, color=3, palette=palette))


def test_16bit_scales_to_high_byte():
    img16 = _img(6, 7, 3, seed=7, dtype=np.uint16)
    got = decode_png(encode_png(img16, color=2, depth=16))
    assert (got == (img16 >> 8).astype(np.uint8)).all()


def test_corruption_and_seams():
    img = _img(9, 9, 3, seed=8)
    enc = bytearray(encode_png(img, color=2))
    # flipped byte inside IDAT -> CRC mismatch, typed error
    i = bytes(enc).index(b"IDAT") + 8
    enc[i] ^= 0xFF
    with pytest.raises(PngError):
        decode_png(bytes(enc))
    # truncated Adam7 stream (valid CRCs, too few pass bytes) is a
    # typed error, not garbage pixels
    interlaced = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 1)) \
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) \
        + _chunk(b"IEND", b"")
    with pytest.raises(PngError):
        decode_png(interlaced)
    # sub-8-bit TRUECOLOR is not a legal PNG combination -> typed error
    deep = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 9, 9, 4, 2, 0, 0, 0)) \
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) \
        + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="illegal"):
        decode_png(deep)
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    with pytest.raises(PngError):
        decode_png(bytes(encode_png(img, color=2))[:40])


def test_decode_image_bytes_sniffs_png():
    from parquet_rs_ray.ops.multimodal import decode_image_bytes
    img = _img(30, 20, 3, seed=9)
    out = decode_image_bytes(encode_png(img, color=2), (15, 10))
    assert out.shape == (15, 10, 3)
    with pytest.raises(NotImplementedError):
        decode_image_bytes(
            b"RIFF\x10\x00\x00\x00WEBP"
            b"VP8 \x04\x00\x00\x00\x00\x00\x00\x00", (8, 8))


def test_adam7_rgb_roundtrip_bit_exact():
    # odd dims so every pass has ragged edges; filters cycle 0-4
    img = _img(21, 13, 3, seed=10)
    got = decode_png(encode_png(img, color=2, interlace=True))
    assert (got == img).all()


def test_adam7_all_color_types_and_16bit():
    g = _img(10, 11, 1, seed=11)
    got = decode_png(encode_png(g, color=0, interlace=True))
    assert (got[:, :, 0] == g).all()
    rgba = _img(9, 17, 4, seed=12)
    got = decode_png(encode_png(rgba, color=6, interlace=True))
    assert (got == rgba[:, :, :3]).all()
    rng = np.random.default_rng(13)
    palette = rng.integers(0, 256, (64, 3)).astype(np.uint8)
    idx = rng.integers(0, 64, (12, 7)).astype(np.uint8)
    got = decode_png(encode_png(idx, color=3, palette=palette,
                                interlace=True))
    assert (got == palette[idx]).all()
    img16 = _img(14, 6, 3, seed=14, dtype=np.uint16)
    got = decode_png(encode_png(img16, color=2, depth=16, interlace=True))
    assert (got == (img16 >> 8).astype(np.uint8)).all()


def test_adam7_tiny_images_with_empty_passes():
    # below 8x8 several Adam7 passes are empty (zero bytes in stream)
    for h, w in [(1, 1), (1, 5), (5, 1), (3, 3), (7, 2), (2, 7), (8, 8)]:
        img = _img(h, w, 3, seed=h * 10 + w)
        got = decode_png(encode_png(img, color=2, interlace=True))
        assert (got == img).all(), (h, w)


def test_sub8bit_gray_and_palette():
    rng = np.random.default_rng(30)
    for depth in (1, 2, 4):
        hi = (1 << depth) - 1
        g = rng.integers(0, hi + 1, (11, 13)).astype(np.uint8)
        got = decode_png(encode_png(g, color=0, depth=depth))
        exp = (g.astype(np.uint16) * 255 // hi).astype(np.uint8)
        assert (got[:, :, 0] == exp).all(), depth
        palette = rng.integers(0, 256, (hi + 1, 3)).astype(np.uint8)
        idx = rng.integers(0, hi + 1, (9, 17)).astype(np.uint8)
        got = decode_png(encode_png(idx, color=3, depth=depth,
                                    palette=palette))
        assert (got == palette[idx]).all(), depth


def test_adam7_sub8bit_gray_and_palette_bit_exact():
    """Interlaced sub-8-bit: every depth × color-type × odd-size combo,
    each Adam7 pass bit-unpacked independently before the scatter;
    values exact vs the source samples (gray scales to 8-bit)."""
    rng = np.random.default_rng(31)
    for depth in (1, 2, 4):
        hi = (1 << depth) - 1
        for h, w in [(1, 1), (3, 9), (11, 13), (8, 8), (17, 5)]:
            g = rng.integers(0, hi + 1, (h, w)).astype(np.uint8)
            got = decode_png(encode_png(g, color=0, depth=depth,
                                        interlace=True))
            exp = (g.astype(np.uint16) * 255 // hi).astype(np.uint8)
            assert (got[:, :, 0] == exp).all(), (depth, h, w)
        palette = rng.integers(0, 256, (hi + 1, 3)).astype(np.uint8)
        idx = rng.integers(0, hi + 1, (9, 17)).astype(np.uint8)
        got = decode_png(encode_png(idx, color=3, depth=depth,
                                    palette=palette, interlace=True))
        assert (got == palette[idx]).all(), depth
