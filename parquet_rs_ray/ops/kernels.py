"""Shared vectorized kernels for ragged (variable-length-segment)
data, used by the tokenizer and sequence-packing ops. One home for the
gather arithmetic so an off-by-one fix can't land in only one copy."""

from __future__ import annotations

import numpy as np

__all__ = ["ragged_positions"]


def ragged_positions(src_starts: np.ndarray,
                     lengths: np.ndarray) -> np.ndarray:
    """Flat index array that concatenates the segments
    ``[src_starts[i], src_starts[i] + lengths[i])`` in order — i.e.
    ``flat[ragged_positions(s, l)]`` is the vectorized equivalent of
    ``np.concatenate([flat[s[i]:s[i]+l[i]] for i in range(len(l))])``
    with no Python loop over segments."""
    lengths = np.asarray(lengths, np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(lengths)
    starts_out = ends - lengths
    idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    return (np.arange(total, dtype=np.int64) - starts_out[idx]
            + np.asarray(src_starts, np.int64)[idx])
