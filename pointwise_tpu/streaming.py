"""Exact streaming inference for scans too large for one padded batch.

BASELINE.json config 5: "~1M-pt scenes, bucketed padded-neighbor batching".
The reference never solves this — its eval crops blocks and votes, which is
approximate at block borders.  This engine is *exact* overlap-save
convolution instead:

  * the scene is partitioned into spatial tiles (native grid-hash index,
    pointwise_tpu/native);
  * each tile is processed together with a halo of width H = sum of the
    network's kernel radii (the receptive field of the conv stack), so the
    tile-interior outputs equal the full-scene computation exactly;
  * tiles are padded to a small set of bucket sizes so XLA compiles once
    per bucket (static shapes), and batched per bucket;
  * tile coordinates are re-centered before entering the net — the conv is
    translation-invariant, and this keeps f32 precision over large scenes.

Memory high-water on device is one bucket batch, independent of scene size.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from pointwise_tpu.native import GridIndex
from pointwise_tpu.utils.spatial import morton_code

DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768)


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


def stream_apply(
    apply_fn: Callable,
    xyz: np.ndarray,
    features: np.ndarray,
    *,
    halo: float,
    tile_size: float,
    out_dim: int,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    tile_batch: int = 4,
    progress: Callable | None = None,
) -> np.ndarray:
    """Run ``apply_fn(points, features, mask) -> (B, N, out_dim)`` over a
    whole scene, tile by tile, exactly.

    apply_fn must be translation-invariant in ``points`` (pointwise-conv
    stacks are) and respect ``mask``.  ``halo`` must be >= the receptive
    field (sum of kernel radii) for exactness.

    Returns (len(xyz), out_dim) float32 outputs for every point.
    """
    xyz = np.asarray(xyz, np.float32)
    features = np.asarray(features, np.float32)
    grid = GridIndex(xyz, tile_size)
    cells = grid.nonempty_cells()

    jobs = []
    for c in cells:
        lo = grid.origin + c.astype(np.float32) * tile_size
        hi = lo + tile_size
        interior = grid.query_box(lo, hi)
        if len(interior) == 0:
            continue
        cand = grid.query_box(lo - halo, hi + halo + 1e-5)
        # Morton-sort candidates so the conv kernels' tile early-out fires.
        cand = cand[np.argsort(morton_code(xyz[cand]), kind="stable")]
        jobs.append((lo + 0.5 * tile_size, interior, cand))

    # group by bucket size
    groups: dict[int, list] = {}
    for job in jobs:
        b = _bucket_for(len(job[2]), buckets)
        groups.setdefault(b, []).append(job)

    out = np.zeros((len(xyz), out_dim), np.float32)
    done = 0
    for b in sorted(groups):
        js = groups[b]
        # big buckets: shrink the tile batch (bounds device memory and lets
        # the conv's CSR walk keep its scalar tables within SMEM)
        tbs = max(1, min(tile_batch, (8192 * tile_batch) // b))
        for s in range(0, len(js), tbs):
            chunk = js[s : s + tbs]
            tb = len(chunk)
            pts = np.zeros((tbs, b, 3), np.float32)
            fts = np.zeros((tbs, b, features.shape[-1]), np.float32)
            msk = np.zeros((tbs, b), np.float32)
            for t, (center, _, cand) in enumerate(chunk):
                m = len(cand)
                pts[t, :m] = xyz[cand] - center     # translation-invariant
                fts[t, :m] = features[cand]
                msk[t, :m] = 1.0
            logits = np.asarray(apply_fn(pts, fts, msk), np.float32)
            for t, (center, interior, cand) in enumerate(chunk):
                order = np.argsort(cand)
                pos = order[np.searchsorted(cand[order], interior)]
                out[interior] = logits[t, pos]
            done += tb
            if progress:
                progress(done, len(jobs), b)
    return out
