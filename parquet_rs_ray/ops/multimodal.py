"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

Decode support is split by what needs a codec library:

* REAL kernels (no library required, production implementations):
  PPM/PGM (P6/P5) and uncompressed BMP (24/32 bpp) image decode +
  nearest-neighbor resize (`DecodeImage`), and PCM s16le audio
  features (`AudioPcmFeatures`).
* SEAM: compressed formats (jpeg/png/mp4...) need Pillow/av, which are
  not in this container — `DecodeImage` raises ``NotImplementedError``
  naming the seam when it meets one, or produces a deterministic fake
  decode when constructed with ``fake=True`` (shape + checksum derived
  from payload bytes) so pipelines exercise the full Ray plumbing.

Schema convention for a multimodal column ``media``:
    media:        binary          (opaque encoded payload)
    media_format: string          ("jpeg" / "wav" / "mp4" / ...)
    media_meta:   string (JSON)   ({"width":..,"height":..} etc.)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa


def attach_media(batch: pa.Table, *, payload_col: str, fmt: str,
                 meta: dict | None = None) -> pa.Table:
    """Promote a raw binary column to the media convention: cast to
    ``binary`` and add format + JSON metadata columns."""
    col = batch.column(payload_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_binary(col.type) and not pa.types.is_large_binary(col.type):
        col = col.cast(pa.binary())
    n = len(batch)
    out = batch.set_column(batch.column_names.index(payload_col),
                           payload_col, col)
    out = out.append_column(f"{payload_col}_format",
                            pa.array([fmt] * n, pa.string()))
    out = out.append_column(f"{payload_col}_meta",
                            pa.array([json.dumps(meta or {})] * n, pa.string()))
    return out


def _fake_decode(payload: bytes, target_hw: tuple[int, int]) -> dict:
    """Deterministic stand-in for an image decode: derives a stable
    "pixel" checksum and output shape from the payload bytes alone, so
    tests are reproducible without a codec library."""
    digest = hashlib.blake2b(payload, digest_size=16).digest()
    h, w = target_hw
    return {
        "height": h,
        "width": w,
        "channels": 3,
        "pixel_checksum": int.from_bytes(digest[:8], "little", signed=True),
    }


def _ppm_header(payload: bytes, start: int = 0) -> tuple[int, int, int, int]:
    """Parse one P6/P5 header at ``start``: (w, h, channels,
    raster offset). Header tokens may be separated by any whitespace
    and interleaved with ``#`` comments (netpbm spec)."""
    magic = payload[start:start + 2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    toks, i, n = [], start + 2, len(payload)
    while len(toks) < 3:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(payload[i:j]))
        i = j
    i += 1                              # the single whitespace
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return w, h, (1 if magic == b"P5" else 3), i


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6, rgb) / PGM (P5, gray → rgb) to a
    (h, w, 3) uint8 array."""
    w, h, c, off = _ppm_header(payload)
    raster = np.frombuffer(payload, np.uint8, count=h * w * c, offset=off)
    img = raster.reshape(h, w, c)
    return np.repeat(img, 3, axis=2) if c == 1 else img


def split_ppm_stream(payload: bytes) -> list[tuple[int, int]]:
    """Frame boundaries ``[(start, end), ...]`` of a concatenated
    PPM/PGM stream — the exact byte format ffmpeg's
    ``-f image2pipe -vcodec ppm`` emits for raw video. Each frame is a
    standalone netpbm payload, so a slice decodes with `_decode_ppm`.
    Raises on a truncated final frame (corrupt stream ≠ short video)."""
    bounds, i, n = [], 0, len(payload)
    while i < n:
        w, h, c, off = _ppm_header(payload, i)
        end = off + w * h * c
        if end > n:
            raise ValueError(
                f"truncated PPM stream: frame {len(bounds)} needs "
                f"{end - n} more raster bytes")
        bounds.append((i, end))
        i = end
    return bounds


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bpp BMP (BI_RGB) to (h, w, 3)
    uint8 rgb. Handles 4-byte row padding, bottom-up and top-down row
    order, and drops the alpha byte of 32-bpp payloads."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={comp} bpp={bpp}: only uncompressed "
            f"24/32-bpp BMP decodes without a codec library")
    bottom_up = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    img = rows[:, :w * nb].reshape(h, w, nb)
    if bottom_up:
        img = img[::-1]
    return img[:, :, 2::-1]             # BGR(A) → RGB


def _resize_nearest(img: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize (sample at pixel centers)."""
    th, tw = target_hw
    h, w = img.shape[:2]
    ri = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return img[ri][:, ci]


def decode_image_bytes(payload: bytes,
                       target_hw: tuple[int, int]) -> np.ndarray:
    """Sniff + decode + resize one image payload. PPM/PGM/BMP and
    baseline AND progressive JPEG (the dominant web format — see
    ops/jpeg.py) decode for real (pure numpy); anything else is the
    codec-library seam."""
    if payload[:2] in (b"P6", b"P5"):
        img = _decode_ppm(payload)
    elif payload[:2] == b"BM":
        img = _decode_bmp(payload)
    elif payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        img = decode_jpeg(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png
        img = decode_png(payload)
    elif payload[:4] == b"GIF8":
        from .gif import decode_gif
        img = decode_gif(payload)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp
        img = decode_webp(payload)       # lossless VP8L decodes for
        # real; lossy VP8 raises the arithmetic-coder seam inside
    else:
        raise NotImplementedError(
            "avif (and other av1-class formats) need a codec library "
            "(Pillow/OpenCV) that is not in this container; "
            "PPM/PGM/BMP, JPEG, PNG, GIF and lossless WebP decode "
            "natively, or pass fake=True for the deterministic stub")
    return np.ascontiguousarray(_resize_nearest(img, target_hw))


class DecodeImage:
    """Actor-pool stage: decode + resize an image ``binary`` column.

    ``__init__`` holds per-actor state once (target geometry; a real
    codec library would warm here); ``__call__`` decodes a batch.
    PPM/PGM/BMP, JPEG (baseline + progressive), PNG, GIF and lossless
    WebP (VP8L) payloads decode for REAL (pure-numpy kernels,
    nearest-neighbor resize); the remaining formats (lossy-VP8 webp,
    avif, arithmetic-coded JPEG — all arithmetic-coder-bound) raise
    ``NotImplementedError`` naming the Pillow/OpenCV seam — unless
    ``fake=True``, which replaces decode with the deterministic
    payload-hash stub for plumbing tests. Output layout is identical
    either way: height/width/channels + a blake2b ``pixel_checksum``
    (of the resized rgb raster in real mode). Use with small
    ``batch_size`` (payloads are large):

        ds.map_batches(DecodeImage, fn_constructor_kwargs={...},
                       batch_format="pyarrow", batch_size=32,
                       concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self, payload_col: str = "media",
                 target_hw: tuple[int, int] = (224, 224), fake: bool = False,
                 emit_pixels: bool = False):
        self.payload_col = payload_col
        self.target_hw = tuple(target_hw)
        self.fake = fake
        self.emit_pixels = emit_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        decoded, pixels = [], []
        for p in payloads:
            p = p or b""
            if self.fake:
                decoded.append(_fake_decode(p, self.target_hw))
                pixels.append(b"")
                continue
            img = decode_image_bytes(p, self.target_hw)
            raw = img.tobytes()
            digest = hashlib.blake2b(raw, digest_size=8).digest()
            decoded.append({
                "height": img.shape[0], "width": img.shape[1],
                "channels": img.shape[2],
                "pixel_checksum": int.from_bytes(digest, "little",
                                                 signed=True),
            })
            pixels.append(raw)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("height", pa.array(
            [d["height"] for d in decoded], pa.int32()))
        out = out.append_column("width", pa.array(
            [d["width"] for d in decoded], pa.int32()))
        out = out.append_column("channels", pa.array(
            [d["channels"] for d in decoded], pa.int32()))
        out = out.append_column("pixel_checksum", pa.array(
            [d["pixel_checksum"] for d in decoded], pa.int64()))
        if self.emit_pixels:
            out = out.append_column("pixels", pa.array(pixels, pa.binary()))
        return out


class SampleFrames:
    """Actor-pool stage: deterministic temporal frame sampling from a
    video ``binary`` column (flat_map semantics: one output row per
    sampled frame).

    REAL path: payloads with a netpbm magic are parsed as concatenated
    PPM/PGM streams (ffmpeg ``image2pipe``/``-vcodec ppm`` raw video);
    the sampler picks ≤ ``num_frames`` evenly spaced REAL frames
    (``frame_idx`` = floor(k·n_frames/F), the standard uniform temporal
    sampling) and emits each frame's exact standalone netpbm bytes —
    directly decodable downstream by `DecodeImage(fake=False)`.
    Compressed containers (mp4/webm/...) need an av library that is not
    in this environment: byte-offset slices stand in (the named stub),
    keeping the Ray plumbing — schema, fan-out, actor signature —
    identical to the real path."""

    def __init__(self, payload_col: str = "media", num_frames: int = 4):
        self.payload_col = payload_col
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        n, F = len(payloads), self.num_frames
        doc_of, fidx, nf_col, frames = [], [], [], []
        for row, p in enumerate(payloads):
            p = p or b""
            if p[:2] in (b"P6", b"P5"):
                bounds = split_ppm_stream(p)
                nf = len(bounds)
                take = min(F, nf)
                picks = (np.arange(take, dtype=np.int64) * nf) // take
                for k in picks:
                    s, e = bounds[int(k)]
                    frames.append(p[s:e])
                fidx.extend(int(k) for k in picks)
                doc_of.extend([row] * take)
                nf_col.extend([nf] * take)
            elif p[:4] == b"GIF8":
                # animated GIF: structural count first (no LZW work),
                # then one sequential composition pass that stops at
                # the LAST picked frame, each pick serialized as
                # standalone P6 bytes decodable downstream by
                # DecodeImage(fake=False)
                from .gif import count_frames, gif_frames
                nf = count_frames(p)
                if nf == 0:          # structurally valid, zero images:
                    continue         # nothing to sample from this row
                take = min(F, nf)
                picks = (np.arange(take, dtype=np.int64) * nf) // take
                want = set(int(k) for k in picks)
                last = int(picks[-1])
                for i, fr in enumerate(gif_frames(p)):
                    if i in want:
                        hh, ww = fr.shape[:2]
                        frames.append(
                            b"P6\n%d %d\n255\n" % (ww, hh)
                            + fr.tobytes())
                    if i >= last:    # don't decode past the last pick
                        break
                fidx.extend(int(k) for k in picks)
                doc_of.extend([row] * take)
                nf_col.extend([nf] * take)
            else:
                step = max(1, len(p) // max(1, F))
                frames.extend(p[f * step:(f + 1) * step] for f in range(F))
                fidx.extend(range(F))
                doc_of.extend([row] * F)
                nf_col.extend([F] * F)
        # key columns duplicate via one Arrow take (no per-value .as_py())
        out = batch.drop_columns([self.payload_col]).take(
            pa.array(np.asarray(doc_of, dtype=np.int64)))
        out = out.append_column(
            "frame_idx", pa.array(np.asarray(fidx, dtype=np.int32)))
        out = out.append_column(
            "n_frames", pa.array(np.asarray(nf_col, dtype=np.int64)))
        return out.append_column("frame_bytes", pa.array(frames, pa.binary()))


def decode_images(ds, *, payload_col: str = "media",
                  target_hw: tuple[int, int] = (224, 224),
                  batch_size: int = 32, concurrency=2, fake: bool = True):
    """Dataset-level wrapper: small batches (large payloads), actor pool."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "target_hw": target_hw, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def _pcm_samples(col: pa.Array):
    """(flat float64 samples of all clips, samples per clip) straight
    from a binary Arrow array's buffers. Odd-length payloads drop the
    trailing half-sample; nulls count as empty clips. Zero-copy i2 view
    when every clip starts on an even byte and has even length (binary
    offsets are contiguous, so that is one view over the value buffer);
    per-clip numpy-slice gather otherwise."""
    if col.null_count:
        col = col.fill_null(b"")
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    off = np.frombuffer(col.buffers()[1], odt)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    buf = col.buffers()[2]
    data = np.frombuffer(buf, np.uint8) if buf is not None else \
        np.zeros(0, np.uint8)
    b0, b1 = off[:-1], off[1:]
    blen = (b1 - b0) & ~np.int64(1)
    lens = blen // 2
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0), lens
    if (b0[0] & 1) == 0 and (blen == (b1 - b0)).all():
        # contiguous even clips: one view over [first, last) bytes
        i2 = data[b0[0]:b1[-1]].view("<i2")
    else:
        u8 = np.concatenate([data[s:s + m]
                             for s, m in zip(b0, blen) if m])
        i2 = u8.view("<i2")
    return i2.astype(np.float64) / 32768.0, lens


def parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE (the raw-audio container of the web) → (mono float64
    samples in [-1, 1), sample rate). PCM16 only — multi-channel
    downmixes by channel mean; compressed WAVE format tags (and
    mp3/ogg/flac, which aren't RIFF at all) are the named codec-library
    seam. Word-aligned chunk walk per RIFF; a truncated chunk raises a
    typed ValueError."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    off, fmt, raw = 12, None, None
    while off + 8 <= len(data):
        cid, size = data[off:off + 4], struct.unpack_from("<I", data,
                                                          off + 4)[0]
        body = data[off + 8:off + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAVE chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        off += 8 + size + (size & 1)       # chunks are word-aligned
    if fmt is None or raw is None or len(fmt) < 16:
        raise ValueError("WAVE missing fmt /data chunk")
    tag, ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if tag != 1 or bits != 16 or ch < 1:
        raise NotImplementedError(
            f"WAVE fmt tag={tag} bits={bits}: only uncompressed PCM16 "
            "parses natively; compressed audio needs a codec library "
            "that is not in this container")
    frame = 2 * ch
    raw = raw[:len(raw) // frame * frame]
    s = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    if ch > 1:
        s = s.reshape(-1, ch).mean(axis=1)
    return s, int(rate)


class AudioPcmFeatures:
    """Actor-pool stage: REAL (not stubbed) per-clip audio features over
    raw PCM s16le ``binary`` payloads — raw PCM needs no codec library,
    so unlike image decode this kernel is the production one:
    duration_s, sample_rate, rms, peak, zero-crossing rate. RIFF/WAVE
    containers parse natively too (`parse_wav`: PCM16, multi-channel
    mean-downmixed, per-clip fmt sample rate overriding the constructor
    default); compressed audio stays the named codec seam.

    Vectorized across the batch: samples are read straight from the
    Arrow binary column's flat value buffer (zero-copy when every clip
    starts on an even byte — the common case for 2-byte-aligned
    payloads; a per-clip gather otherwise), per-clip reductions run via
    ``np.add.reduceat`` over segment offsets (only non-empty segments —
    reduceat misbehaves on repeated indices), zero-crossings mask out
    inter-clip boundaries. Truncated payloads (odd byte count) drop
    their trailing half-sample rather than erroring."""

    def __init__(self, payload_col: str = "media",
                 sample_rate: int = 16000):
        self.payload_col = payload_col
        self.rate = float(sample_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = batch.column(self.payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        rates = np.full(n, self.rate)
        # sniff the full 12-byte RIFF/WAVE signature: raw-PCM sample
        # bytes are arbitrary, so a 4-byte b"RIFF" prefix alone would
        # misroute ~2^-32 of raw clips into the WAV parser
        heads = pc.binary_slice(
            col.fill_null(b"") if col.null_count else col,
            0, 12).to_pylist()
        is_wav = [h[:4] == b"RIFF" and h[8:12] == b"WAVE" for h in heads]
        if any(is_wav):
            # WAV containers in the batch: per-clip parse (header walk
            # is per-item by nature, like image decode); raw-PCM clips
            # in the same batch keep the s16le convention
            parts, lens = [], np.zeros(n, np.int64)
            for i, p in enumerate(col.to_pylist()):
                p = p or b""
                if is_wav[i]:
                    s, r = parse_wav(p)
                    rates[i] = float(r)
                else:
                    s = np.frombuffer(p[:len(p) & ~1], "<i2") \
                        .astype(np.float64) / 32768.0
                parts.append(s)
                lens[i] = len(s)
            flat = np.concatenate(parts) if n else np.zeros(0)
        else:
            flat, lens = _pcm_samples(col)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        rms = np.zeros(n)
        peak = np.zeros(n)
        zcr = np.zeros(n)
        nz = lens > 0
        if nz.any():
            seg = starts[:-1][nz]
            rms[nz] = np.sqrt(np.add.reduceat(flat * flat, seg) / lens[nz])
            peak[nz] = np.maximum.reduceat(np.abs(flat), seg)
            # sign changes; crossings at clip boundaries are masked out
            sgn = np.signbit(flat)
            cross = (sgn[1:] != sgn[:-1]).astype(np.float64)
            bnd = starts[1:-1] - 1
            # leading empty clips give bnd == -1 (would wrongly mask the
            # LAST crossing); trailing empty clips give bnd == len(cross)
            # (no sample after) — both have no real boundary to mask
            cross[bnd[(bnd >= 0) & (bnd < len(cross))]] = 0.0
            multi = nz & (lens > 1)
            if multi.any():
                segc = starts[:-1][multi]  # multi ⇒ ≤ len(cross)-1 always
                csum = np.concatenate([[0.0], np.cumsum(cross)])
                ends = segc + lens[multi] - 1
                zcr[multi] = (csum[ends] - csum[segc]) / (lens[multi] - 1)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("duration_s", pa.array(lens / rates))
        out = out.append_column("sample_rate", pa.array(rates))
        out = out.append_column("rms", pa.array(rms))
        out = out.append_column("peak", pa.array(peak))
        return out.append_column("zero_crossing_rate", pa.array(zcr))


def audio_features(ds, *, payload_col: str = "media",
                   sample_rate: int = 16000, batch_size: int = 64,
                   concurrency=2):
    """Dataset-level wrapper for `AudioPcmFeatures` (small batches —
    audio payloads are large)."""
    return ds.map_batches(
        AudioPcmFeatures,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "sample_rate": sample_rate},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
