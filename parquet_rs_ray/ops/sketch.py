"""Mergeable sketches for large-scale profiling (the "novel sketch"
custom-operator slot): HyperLogLog distinct-count, count-min heavy
hitters, and grid quantiles over any column.

Scale shape (shared by all three): each batch folds its values into a
FIXED-size summary inside map_batches — HLL: one 2^p register array
(4 KiB, merge = element-wise max); count-min: one d×W counter matrix
(512 KiB, merge = element-wise sum) + local candidates; quantiles: k
weighted order statistics. ONLY summaries leave the workers (one tiny
row per batch) and the driver merges them — at 10^12 rows the payload
is #batches × summary-size regardless of cardinality, where the exact
counterparts (distinct_count / top_terms / exact_quantiles) shuffle one
row per distinct value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P = 12                      # 4096 registers ⇒ ~1.6% relative error
_M = 1 << _P
# bias constant alpha_m for m >= 128 (Flajolet et al. 2007)
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _column_hashes(arr) -> np.ndarray:
    """Finalized 64-bit hashes per non-null value. HLL reads the TOP
    bits as the register index and the FNV-style string hash disperses
    mostly into low bits (measured: 285/4096 registers hit for 7k short
    similar strings), so everything passes through the shared splitmix64
    finalizer."""
    from .dedup import _hash_strings, int_column_u64, splitmix64
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()  # COUNT(DISTINCT) semantics exclude NULL
    if pa.types.is_floating(arr.type):
        # hash the IEEE bit pattern — casting 1.5 to int64 raises, and
        # integral floats must not collide with equal ints
        v = arr.cast(pa.float64()).to_numpy(zero_copy_only=False) \
            .view(np.uint64).copy()
        return splitmix64(v ^ np.uint64(0x9E3779B97F4A7C15))
    if pa.types.is_integer(arr.type):
        return splitmix64(int_column_u64(arr))
    return splitmix64(_hash_strings(
        arr.cast(pa.string()) if not pa.types.is_binary(arr.type) else arr))


def _leading_zeros64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros: smear the highest set bit
    down (OR-shift doubling), then 64 − popcount. Replaces the float64
    log2 path, whose half-ULP round-up just below powers of two
    overstated the rank by 1 (ADVICE r2)."""
    from .dedup import _popcount64
    x = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return 64 - _popcount64(x)


def _registers(h: np.ndarray) -> np.ndarray:
    """Fold a batch of 64-bit hashes into one HLL register array."""
    regs = np.zeros(_M, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = (h << np.uint64(_P)) | np.uint64((1 << _P) - 1)  # sentinel tail
    # rank = #leading zeros of `rest` + 1 (sentinel ⇒ rest never 0)
    rank = (_leading_zeros64(rest) + 1) \
        .clip(1, 64 - _P + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)          # small-range correction
    return float(est)


# Distributed tree-merge fan-in shared by all three sketches: each merge
# stage folds up to 64 sketch rows into one, so after the two fixed
# stages the driver merges O(#batches / 64²) summaries — at 10^6 input
# batches that's ~250 rows through the driver instead of ~0.5 TB of
# matrices (the r2 anti-pattern: every batch's summary fanned into one
# driver loop).
_MERGE_FANIN = 64


def _hll_merge(batch: pa.Table) -> pa.Table:
    """Element-wise max of up to _MERGE_FANIN register rows (HLL merge
    is idempotent max, so tree shape/remainders don't matter)."""
    flat = batch.column("regs").combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False)
    regs = flat.reshape(-1, _M).max(axis=0).astype(np.uint8)
    return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})


def _hll_parts(ds, col: str):
    """Per-batch register rows, pre-merged distributedly (exposed for
    the driver-payload-bounded test)."""
    def fold(batch: pa.Table) -> pa.Table:
        regs = _registers(_column_hashes(batch.column(col)))
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    parts = ds.select_columns([col]).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True)
    # num_cpus=0.5 sizes the trivial max-merge AND (different resource
    # request) keeps Ray from fusing this stage into fold's tasks —
    # fused, the merge would see one register row per fold task and
    # never reduce. Register rows are 4 KiB, so a 4096-way single-stage
    # fan-in is ~16 MiB per merge task.
    return parts.map_batches(_hll_merge, batch_format="pyarrow",
                             batch_size=_MERGE_FANIN ** 2, num_cpus=0.5)


def hll_distinct(ds, col: str):
    """Approximate COUNT(DISTINCT col) via distributed HyperLogLog
    (p=12, ~1.6% relative error — asserted vs exact in tests).
    Returns a 1-row pandas DataFrame {approx_distinct}."""
    import pandas as pd

    merged = np.zeros(_M, dtype=np.uint8)
    for b in _hll_parts(ds, col).iter_batches(batch_format="pyarrow"):
        for r in b.column("regs").to_pylist():  # few rows after tree-merge
            merged = np.maximum(merged, np.asarray(r, dtype=np.uint8))
    return pd.DataFrame({"approx_distinct": [int(round(_estimate(merged)))]})


# ------------------------------------------------------- count-min sketch

_CMS_D = 4                    # depth: P(overcount > eps) <= e^-4 ≈ 1.8%
_CMS_W = 1 << 14              # width: eps ≈ e/16384 ≈ 0.017% of total


def _cms_rows(h: np.ndarray) -> np.ndarray:
    """(d, n) row indices into the width-W counter rows — d pairwise-
    independent views of one 64-bit hash (seeded splitmix re-mix)."""
    from .dedup import splitmix64
    idx = np.empty((_CMS_D, len(h)), dtype=np.int64)
    for d in range(_CMS_D):
        seed = np.uint64((0x9E3779B97F4A7C15 * (d + 1))
                         & 0xFFFFFFFFFFFFFFFF)
        idx[d] = (splitmix64(h ^ seed)
                  % np.uint64(_CMS_W)).astype(np.int64)
    return idx


def cms_topk(ds, col: str, *, k: int = 20, candidates_per_batch: int = 64):
    """Approximate heavy hitters with BOUNDED memory: a count-min sketch
    (d×W int64 ≈ 512 KiB) plus each batch's exact local top candidates.

    Scale shape — the unbounded-vocabulary regime `top_terms` cannot
    enter: exact grouped counting shuffles one row per distinct value;
    at web scale (billions of distinct tokens) that IS the data. Here
    each batch emits its sketch matrix + ≤``candidates_per_batch``
    candidate values (a true heavy hitter is a local heavy hitter in
    enough batches), the driver merges matrices by ELEMENT-WISE SUM
    (count-min is linear) and scores the union of candidates against
    the merged sketch. Counts are overestimates by ≤ εN with
    probability 1−e^−d; recall of the true top-k is tested against the
    exact counter in tests. Returns a pandas DataFrame
    (value, approx_count) sorted descending."""
    import pandas as pd

    def fold(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        vc = arr.value_counts()
        # candidates cross batches as BYTES (binary-safe — string cast
        # would raise on non-UTF8 binary columns); sketch updates and
        # scoring hash the same byte form
        vals = vc.field("values")
        if not pa.types.is_binary(vals.type):
            vals = vals.cast(pa.string()).cast(pa.binary())
        counts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _column_hashes(vals)
        mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        rows = _cms_rows(h)
        for d in range(_CMS_D):
            np.add.at(mat[d], rows[d], counts)
        top = np.argsort(-counts)[:candidates_per_batch]
        cand = vals.take(pa.array(top))
        return pa.table({
            "mat": pa.array([mat.tobytes()], pa.binary()),
            "cands": pa.array([cand.to_pylist()],
                              pa.list_(pa.binary())),
        })

    parts = _cms_merged_parts(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True))
    mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    cands: set[bytes] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        for mb, cl in zip(b.column("mat").to_pylist(),
                          b.column("cands").to_pylist()):
            mat += np.frombuffer(mb, dtype=np.int64) \
                .reshape(_CMS_D, _CMS_W)
            cands.update(cl)
    if not cands:
        return pd.DataFrame({"value": [], "approx_count": []})
    cand_list = sorted(cands)
    est = _cms_score(mat, cand_list)
    order = np.argsort(-est, kind="stable")[:k]
    return pd.DataFrame({
        "value": [_as_str(cand_list[i]) for i in order],
        "approx_count": est[order].astype(np.int64),
    })


# candidates kept per merged sketch row: big enough that a true global
# top-k (k≤20 scored from 64-candidate local tops) survives every level
_CMS_MERGE_CANDS = 512


def _cms_score(mat: np.ndarray, cand_list: list[bytes]) -> np.ndarray:
    """Point-query estimates (min over depth rows) for each candidate."""
    h = _column_hashes(pa.array(cand_list, pa.binary()))
    rows = _cms_rows(h)
    est = mat[0][rows[0]]
    for d in range(1, _CMS_D):
        est = np.minimum(est, mat[d][rows[d]])
    return est


def _cms_merge(batch: pa.Table) -> pa.Table:
    """Sum up to _MERGE_FANIN sketch matrices (count-min is linear) and
    keep the top _CMS_MERGE_CANDS candidates scored against the merged
    matrix, so row size stays bounded through every merge level."""
    mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    cands: set[bytes] = set()
    for mb, cl in zip(batch.column("mat").to_pylist(),
                      batch.column("cands").to_pylist()):
        mat += np.frombuffer(mb, dtype=np.int64).reshape(_CMS_D, _CMS_W)
        cands.update(cl)
    cand_list = sorted(cands)
    if len(cand_list) > _CMS_MERGE_CANDS:
        keep = np.argsort(-_cms_score(mat, cand_list),
                          kind="stable")[:_CMS_MERGE_CANDS]
        cand_list = [cand_list[i] for i in sorted(keep)]
    return pa.table({
        "mat": pa.array([mat.tobytes()], pa.binary()),
        "cands": pa.array([cand_list], pa.list_(pa.binary())),
    })


def _cms_merged_parts(parts):
    """Two 64-way distributed merge stages (exposed for the
    driver-payload-bounded test). 512 KiB matrices cap the fan-in at 64
    (~32 MiB per merge task); the distinct num_cpus values keep the
    stages from fusing with the fold (and each other) — fused, each
    merge would see exactly one sketch row and never reduce."""
    parts = parts.map_batches(_cms_merge, batch_format="pyarrow",
                              batch_size=_MERGE_FANIN, num_cpus=0.5)
    return parts.map_batches(_cms_merge, batch_format="pyarrow",
                             batch_size=_MERGE_FANIN, num_cpus=0.25)


def _as_str(b: bytes):
    """Candidates travel as bytes; present UTF-8 ones as str."""
    try:
        return b.decode()
    except UnicodeDecodeError:
        return b


# ------------------------------------------------- quantile grid sketch

def quantile_sketch(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9),
                    k: int = 256):
    """Approximate quantiles with BOUNDED memory — the regime
    `relational.exact_quantiles` cannot enter (its value-count histogram
    degenerates to the column itself for continuous doubles).

    Mergeable grid summary: each batch sorts its values once and emits
    ``k`` evenly-spaced order statistics, each carrying weight n/k; the
    driver merges all (value, weight) pairs — #batches × k rows, fixed
    per batch — and reads quantiles off the weighted cumulative sum.
    Deterministic (no sampling); rank error per batch ≤ n_b/k, so the
    merged rank error is ≤ N/k (~0.4% at k=256). Returns a pandas
    DataFrame (q, value)."""
    import pandas as pd

    def fold(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        v = np.sort(arr.cast(pa.float64()).to_numpy(zero_copy_only=False))
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        kk = min(k, n)
        pos = np.round(np.linspace(0, n - 1, kk)).astype(np.int64)
        return pa.table({"v": pa.array(v[pos]),
                         "w": pa.array(np.full(kk, n / kk))})

    def compress(batch: pa.Table) -> pa.Table:
        """Distributed re-compression: fold up to _MERGE_FANIN·k grid
        rows back into a k-point weighted grid (adds ≤ group-weight/k
        rank error once — still O(N/k) overall), so the driver reads
        O(#batches/64) rows, not every batch's grid."""
        v = batch.column("v").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        if len(v) <= k:
            return pa.table({"v": pa.array(v, pa.float64()),
                             "w": pa.array(w, pa.float64())})
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        targets = (np.arange(k, dtype=np.float64) + 0.5) * (total / k)
        idx = np.searchsorted(cum, targets, side="left") \
            .clip(0, len(v) - 1)
        return pa.table({"v": pa.array(v[idx]),
                         "w": pa.array(np.full(k, total / k))})

    # num_cpus=0.5 keeps compress unfused from fold (fused, it would
    # see one grid per fold task and never reduce); 256 grids × k
    # float rows ≈ 1 MiB per merge task
    parts = ds.map_batches(fold, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .map_batches(compress, batch_format="pyarrow",
                     batch_size=4 * _MERGE_FANIN * k, num_cpus=0.5)
    vs, ws = [], []
    for b in parts.iter_batches(batch_format="pyarrow"):
        vs.append(b.column("v").to_numpy(zero_copy_only=False))
        ws.append(b.column("w").to_numpy(zero_copy_only=False))
    v = np.concatenate(vs) if vs else np.zeros(0)
    w = np.concatenate(ws) if ws else np.zeros(0)
    if len(v) == 0:
        return pd.DataFrame({"q": list(qs), "value": [None] * len(qs)})
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = []
    for q in qs:
        idx = int(np.searchsorted(cum, q * total, side="left"))
        out.append(v[min(idx, len(v) - 1)])
    return pd.DataFrame({"q": list(qs), "value": out})
