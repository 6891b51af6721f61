"""GIF decode (ops/gif.py) against a self-contained, independently
written GIF encoder: LZW width boundaries, KwKwK, table overflow with
mid-stream CLEAR, interlacing, animation composition with transparency
and disposal, truncation errors, and the multimodal seam dispatch."""

import struct

import numpy as np
import pytest

from parquet_rs_ray.ops.gif import (GifError, count_frames, decode_gif,
                                    gif_frames)


# ------------------------------------------------- test-side GIF writer

def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Independent LZW encoder (spec Appendix F): encoder bumps width
    at next_code == 2^width + 1 — one step after the decoder's
    2^width, matching the decoder's one-code entry lag."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    codes = [(clear, width)]
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:                              # table full: restart
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = bytes([k])
    if w:
        codes.append((table[w], width))
    codes.append((eoi, width))
    bitbuf = nbits = 0
    out = bytearray()
    for c, cw in codes:
        bitbuf |= c << nbits
        nbits += cw
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _subblocked(raw: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(raw), 255):
        part = raw[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _make_gif(frames, palette, *, interlace=False, gces=None,
              rects=None, screen=None) -> bytes:
    """frames: list of (fh, fw) uint8 index arrays; gces: per-frame
    None or (disposal, transparent_idx|None); rects: per-frame (x, y)."""
    n = 1
    while n < len(palette) or n < 2:
        n *= 2
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    if screen is None:
        screen = (frames[0].shape[1], frames[0].shape[0])
    sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_bits, 0, 0)
    out += pal.tobytes()
    mcs = max(2, size_bits + 1)
    for f, idx in enumerate(frames):
        gce = (gces or {}).get(f) if isinstance(gces, dict) else \
            (gces[f] if gces else None)
        if gce is not None:
            disposal, transp = gce
            flags = (disposal << 2) | (1 if transp is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0,
                          transp if transp is not None else 0, 0])
        x, y = (rects[f] if rects else (0, 0))
        fh, fw = idx.shape
        out += bytes([0x2C])
        out += struct.pack("<HHHHB", x, y, fw, fh,
                           0x40 if interlace else 0)
        rows = idx
        if interlace:
            order = np.concatenate([np.arange(first, fh, step)
                                    for first, step in _PASSES
                                    if first < fh])
            rows = idx[order]
        out += bytes([mcs])
        out += _subblocked(_lzw_encode(rows.tobytes(), mcs))
    out += bytes([0x3B])
    return bytes(out)


def _pal(n, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, 3),
                                                dtype=np.uint8)


# ---------------------------------------------------------------- tests

def test_gif_roundtrip_random():
    rng = np.random.default_rng(1)
    pal = _pal(16, 1)
    idx = rng.integers(0, 16, (17, 31), dtype=np.uint8)
    got = decode_gif(_make_gif([idx], pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_kwkwk_all_same_index():
    pal = _pal(4, 2)
    idx = np.full((9, 13), 3, np.uint8)    # aaaa… forces code==next_code
    got = decode_gif(_make_gif([idx], pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_width_boundaries_and_table_overflow():
    """Random 256-color noise grows the table through every width bump
    (256→512→…→4096) and past 4096, where the encoder emits CLEAR and
    both sides restart — any width desync corrupts pixels."""
    rng = np.random.default_rng(3)
    pal = _pal(256, 3)
    idx = rng.integers(0, 256, (120, 150), dtype=np.uint8)
    got = decode_gif(_make_gif([idx], pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_gif_interlaced_matches_sequential():
    rng = np.random.default_rng(4)
    pal = _pal(32, 4)
    idx = rng.integers(0, 32, (23, 9), dtype=np.uint8)
    plain = decode_gif(_make_gif([idx], pal))
    inter = decode_gif(_make_gif([idx], pal, interlace=True))
    np.testing.assert_array_equal(inter, plain)
    np.testing.assert_array_equal(inter, pal[idx])


def test_gif_animation_transparency_and_disposal():
    """Frame 2 paints a partial rect with a transparent hole (canvas
    shows through); disposal=2 clears its rect to black before frame 3;
    disposal=3 on frame 3 restores the pre-frame canvas for frame 4."""
    pal = _pal(8, 5)
    base = np.full((10, 12), 1, np.uint8)
    patch = np.full((4, 5), 2, np.uint8)
    patch[1, 1] = 7                        # transparent index
    tiny = np.full((2, 2), 3, np.uint8)
    g = _make_gif(
        [base, patch, tiny, tiny],
        pal,
        gces=[None, (2, 7), (3, None), (0, None)],
        rects=[(0, 0), (3, 2), (0, 0), (6, 6)],
        screen=(12, 10))
    fs = list(gif_frames(g))
    assert len(fs) == 4 and count_frames(g) == 4
    f1, f2, f3, f4 = fs
    np.testing.assert_array_equal(f1, pal[base])
    exp2 = pal[base].copy()
    exp2[2:6, 3:8] = pal[patch]
    exp2[3, 4] = pal[1]                    # hole: canvas shows through
    np.testing.assert_array_equal(f2, exp2)
    # disposal=2 cleared the patch rect to black before frame 3
    exp3 = exp2.copy()
    exp3[2:6, 3:8] = 0
    exp3[0:2, 0:2] = pal[3]
    np.testing.assert_array_equal(f3, exp3)
    # frame 3 had disposal=3: frame 4 composes on the PRE-frame-3 canvas
    exp4 = exp2.copy()
    exp4[2:6, 3:8] = 0
    exp4[6:8, 6:8] = pal[3]
    np.testing.assert_array_equal(f4, exp4)


def test_gif_truncation_and_garbage_raise():
    pal = _pal(8, 6)
    idx = np.random.default_rng(7).integers(0, 8, (20, 20),
                                            dtype=np.uint8)
    g = _make_gif([idx], pal)
    for cut in (4, 10, len(g) // 2, len(g) - 2):
        with pytest.raises(GifError):
            decode_gif(g[:cut])
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF!" + g)


def test_gif_multimodal_dispatch_and_frame_sampling(ray_session):
    """decode_image_bytes routes GIF payloads to the real decoder;
    SampleFrames picks uniform REAL frames from an animated GIF and
    emits standalone P6 bytes that decode back to the composed
    rasters."""
    import pyarrow as pa
    import ray

    from parquet_rs_ray.ops.multimodal import (SampleFrames,
                                               decode_image_bytes)

    pal = _pal(16, 8)
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 16, (8, 11), dtype=np.uint8)
              for _ in range(6)]
    g = _make_gif(frames, pal)
    got = decode_image_bytes(g, (8, 11))
    np.testing.assert_array_equal(got, pal[frames[0]])

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "media": pa.array([g], pa.binary())}))
    out = ds.map_batches(SampleFrames,
                         fn_constructor_kwargs={"num_frames": 3},
                         batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out.frame_idx.tolist() == [0, 2, 4]
    assert (out.n_frames == 6).all()
    composed = list(gif_frames(g))
    for _, row in out.iterrows():
        raster = decode_image_bytes(bytes(row.frame_bytes), (8, 11))
        np.testing.assert_array_equal(raster,
                                      composed[int(row.frame_idx)])


def test_gif_zero_image_and_sampling_skip(ray_session):
    """A structurally valid GIF with zero images yields count 0 and a
    GifError from decode; SampleFrames skips the row instead of
    crashing the batch."""
    import pyarrow as pa
    import ray

    from parquet_rs_ray.ops.multimodal import SampleFrames

    empty_gif = (b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
                 + bytes([0x3B]))
    assert count_frames(empty_gif) == 0
    with pytest.raises(GifError):
        decode_gif(empty_gif)
    pal = _pal(4, 10)
    idx = np.full((3, 3), 1, np.uint8)
    good = _make_gif([idx, idx, idx], pal)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media": pa.array([empty_gif, good], pa.binary())}))
    out = ds.map_batches(SampleFrames,
                         fn_constructor_kwargs={"num_frames": 2},
                         batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out.doc_id.tolist() == [2, 2]       # empty GIF row skipped
    assert out.frame_idx.tolist() == [0, 1]
