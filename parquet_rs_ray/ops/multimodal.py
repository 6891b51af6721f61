"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The real decode libraries (Pillow / torchaudio / av) are not in this
container, so the *decode kernels* are stubbed: ``DecodeImage`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake decode (shape + checksum derived from the payload
bytes).  Everything Ray-side is real and tested: the schema convention,
small-batch sizing for large payloads, the stateful actor signature
(codec tables loaded once in ``__init__``), and the output layout.

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


class DecodeImage:
    """Actor-pool stage: decode + resize an image ``binary`` column.

    Real deployment: ``__init__`` imports and warms the codec library
    once per actor (the expensive part); ``__call__`` decodes a batch.
    Here the decode is stubbed (``fake=True`` for a deterministic fake,
    otherwise ``NotImplementedError`` marks the seam where Pillow/OpenCV
    plug in).  Use with small ``batch_size`` (payloads are large):

        ds.map_batches(DecodeImage, fn_constructor_kwargs={...},
                       batch_format="pyarrow", batch_size=32,
                       concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self, payload_col: str = "media",
                 target_hw: tuple[int, int] = (224, 224), fake: bool = False):
        self.payload_col = payload_col
        self.target_hw = tuple(target_hw)
        self.fake = fake
        if not fake:
            # seam for the real library; loaded once per actor
            raise NotImplementedError(
                "image codec library not available in this container; "
                "pass fake=True for the deterministic stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        decoded = [_fake_decode(p or b"", self.target_hw) for p in payloads]
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("height", pa.array(
            [d["height"] for d in decoded], pa.int32()))
        out = out.append_column("width", pa.array(
            [d["width"] for d in decoded], pa.int32()))
        out = out.append_column("channels", pa.array(
            [d["channels"] for d in decoded], pa.int32()))
        out = out.append_column("pixel_checksum", pa.array(
            [d["pixel_checksum"] for d in decoded], pa.int64()))
        return out


class SampleFrames:
    """Actor-pool stage: pick deterministic frame offsets from a video
    ``binary`` column (stubbed sampler — byte-offset slices stand in for
    decoded frames; flat_map semantics: one output row per frame)."""

    def __init__(self, payload_col: str = "media", num_frames: int = 4):
        self.payload_col = payload_col
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        n, F = len(payloads), self.num_frames
        # key columns duplicate via one Arrow take (no per-value .as_py())
        idx = np.repeat(np.arange(n, dtype=np.int64), F)
        out = batch.drop_columns([self.payload_col]).take(pa.array(idx))
        frames = []
        for p in payloads:
            p = p or b""
            step = max(1, len(p) // max(1, F))
            frames.extend(p[f * step:(f + 1) * step] for f in range(F))
        out = out.append_column(
            "frame_idx", pa.array(np.tile(np.arange(F, dtype=np.int32), n)))
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


class AudioPcmFeatures:
    """Actor-pool stage: REAL (not stubbed) per-clip audio features over
    raw PCM s16le ``binary`` payloads — raw PCM needs no codec library,
    so unlike image decode this kernel is the production one:
    duration_s, rms, peak, zero-crossing rate.

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
        col = batch.column(self.payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
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
        out = out.append_column("duration_s", pa.array(lens / self.rate))
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
