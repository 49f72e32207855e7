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

from pointwise_tpu.ops.pointwise_conv import pointwise_conv


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
) -> jnp.ndarray:
    """Pointwise conv with the point dim sharded over mesh axis ``axis``.

    Must be called inside shard_map/pmap with ``axis`` bound. points_local
    (B, N_local, 3); returns (B, N_local, Cout) for the local centers.
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
        )
    if strategy == "ring":
        return _ring_conv(
            points_local, features_local, weights, bias,
            radius=radius, axis=axis, mask_local=mask_local, impl=impl,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _ring_conv(points_local, features_local, weights, bias, *, radius, axis,
               mask_local, impl):
    """Ring pass: ppermute candidate slabs around the ring and process them
    as one concatenated candidate set for the local centers.

    The fused kernel emits finished outputs (divides by counts and applies W
    internally), so partial per-slab results cannot simply be summed; the
    concatenated-candidates formulation stays exact while the slabs travel
    over ICI neighbor links instead of an all_gather.  (A future variant can
    accumulate raw cell sums/counts per slab once the kernel exposes them.)
    """
    n_dev = jax.lax.axis_size(axis)

    slabs_p = [points_local]
    slabs_f = [features_local]
    slabs_m = [mask_local] if mask_local is not None else None
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    p, f = points_local, features_local
    m = mask_local
    for _ in range(n_dev - 1):
        p = jax.lax.ppermute(p, axis, perm)
        f = jax.lax.ppermute(f, axis, perm)
        slabs_p.append(p)
        slabs_f.append(f)
        if slabs_m is not None:
            m = jax.lax.ppermute(m, axis, perm)
            slabs_m.append(m)
    pts_all = jnp.concatenate(slabs_p, axis=1)
    feats_all = jnp.concatenate(slabs_f, axis=1)
    mask_all = None if slabs_m is None else jnp.concatenate(slabs_m, axis=1)
    return pointwise_conv(
        pts_all, feats_all, weights, bias,
        radius=radius, mask=mask_all,
        centers=points_local, center_mask=mask_local, impl=impl,
    )
