"""Spatial (point-dim) parallelism: shard huge clouds across chips.

The reference handles large scenes by host-side block cropping only
(SURVEY.md section 5, long-context row).  The rebuild adds a second tier:
shard the *point* dimension over a mesh axis and let each chip compute the
convolution for its local centers.  Exactness needs every candidate within
``radius`` of a local center; two strategies:

  * ``gather``: all_gather candidates over the axis (exact for any point
    order; memory O(N_global) per chip — right for N up to a few hundred K).
  * ``ring``: ``ppermute`` halo pass — each chip keeps only its local slab
    plus what streams past in a ring, accumulating partial neighborhoods;
    right for ~1M-point scans (BASELINE.json config 5).  Exact for any
    order too, it just trades memory for ICI traffic.

Both run inside ``shard_map`` and are differentiable (all_gather/ppermute
have transposes), so the same code path trains and serves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointwise_tpu.ops.pointwise_conv import (
    pointwise_conv,
    pointwise_conv_counts,
)


def spatial_pointwise_conv(
    points_local: jnp.ndarray,
    features_local: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    radius: float,
    axis: str = "space",
    mask_local: jnp.ndarray | None = None,
    strategy: str = "gather",
    impl: str = "auto",
    precision: str = "float32",
) -> jnp.ndarray:
    """Pointwise conv with the point dim sharded over mesh axis ``axis``.

    Must be called inside shard_map/pmap with ``axis`` bound. points_local
    (B, N_local, 3); returns (B, N_local, Cout) for the local centers.
    ``precision`` reaches the kernels unchanged, so a spatially-sharded
    model runs the same bf16 masked matmuls as its single-chip twin.
    """
    if strategy == "gather":
        pts_all = jax.lax.all_gather(points_local, axis, axis=1, tiled=True)
        feats_all = jax.lax.all_gather(features_local, axis, axis=1, tiled=True)
        mask_all = (
            None
            if mask_local is None
            else jax.lax.all_gather(mask_local, axis, axis=1, tiled=True)
        )
        return pointwise_conv(
            pts_all,
            feats_all,
            weights,
            bias,
            radius=radius,
            mask=mask_all,
            centers=points_local,
            center_mask=mask_local,
            impl=impl,
            precision=precision,
        )
    if strategy == "ring":
        return _ring_conv(
            points_local, features_local, weights, bias,
            radius=radius, axis=axis, mask_local=mask_local, impl=impl,
            precision=precision,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _ring_conv(points_local, features_local, weights, bias, *, radius, axis,
               mask_local, impl, precision):
    """Memory-bounded ring: per-chip FEATURE footprint stays O(N_local).

    Two phases (the design that actually bounds memory — accumulating raw
    27-cell sums per center would cost 27*cin_p floats/point, MORE than the
    gather strategy below ~27 shards):

      1. GLOBAL per-cell counts from an all_gather of points alone
         (12 B/point — ~40x lighter than features at cin_p=128; geometry
         only, ``pointwise_conv_counts``).
      2. With global counts fixed, the finished convolution is LINEAR in
         the candidate set: y = sum_k (S_k^global / cnt_k^global) W_k
         = sum_slabs sum_k (S_k^slab / cnt_k^global) W_k.  Each chip
         therefore rotates (points, features) slabs around the ring with
         ``ppermute`` and accumulates the kernel's finished partial outputs
         (``ext_counts=`` divides by the global counts in-kernel) — only
         one slab of features is ever resident beyond the chip's own.

    Cost vs gather: ~2x mask-construction arithmetic (the counts pass walks
    the same geometry) and n_dev kernel launches, for O(N_global -> N_local)
    feature memory.  Differentiable end-to-end (the ext-counts kernel has a
    custom VJP; ppermute transposes to the reverse ring).
    """
    n_dev = jax.lax.axis_size(axis)

    pts_all = jax.lax.all_gather(points_local, axis, axis=1, tiled=True)
    mask_all = (
        None if mask_local is None
        else jax.lax.all_gather(mask_local, axis, axis=1, tiled=True)
    )
    counts = pointwise_conv_counts(
        pts_all, radius=radius, mask=mask_all,
        centers=points_local, center_mask=mask_local,
    )

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    p, f, m = points_local, features_local, mask_local
    y = None
    for step in range(n_dev):
        part = pointwise_conv(
            p, f, weights, None, radius=radius, mask=m,
            centers=points_local, center_mask=mask_local,
            impl=impl, precision=precision, ext_counts=counts,
        )
        # accumulate in f32: with bf16 features each partial comes back
        # bf16, and re-rounding the running sum every ring step would make
        # ring drift from gather/single-chip by O(n_dev) ULPs
        part = part.astype(jnp.float32)
        y = part if y is None else y + part
        if step != n_dev - 1:
            p = jax.lax.ppermute(p, axis, perm)
            f = jax.lax.ppermute(f, axis, perm)
            if m is not None:
                m = jax.lax.ppermute(m, axis, perm)
    if bias is not None:
        y = y + bias.astype(y.dtype)
        if mask_local is not None:
            y = y * mask_local.astype(y.dtype)[..., None]
    return y.astype(features_local.dtype)
