"""Pure-jax.numpy reference implementation of the pointwise convolution.

This module is the executable specification of the operator rebuilt from the
reference repo's custom C++ CPU TensorFlow op (hkust-vgd/pointwise; see
SURVEY.md section 0.1 — the reference mount was empty at survey time, so the
semantics below follow SURVEY.md / BASELINE.json's functional spec, which is
the trusted contract):

For every convolution *center* ``p_i``:
  1. radius neighbor query: all candidates ``p_j`` with ``||p_j - p_i|| <= r``
     (Euclidean ball; the center itself is included, landing in the middle
     cell).
  2. 3x3x3 kernel-cell binning: the cube of side ``2r`` centered at ``p_i`` is
     split into 27 cells; neighbor ``j`` goes to the cell containing
     ``p_j - p_i``.  Per axis: ``c = clip(floor((d + r) * 3 / (2r)), 0, 2)``,
     ``cell = cx*9 + cy*3 + cz``.
  3. cell-wise aggregation: features of the points in each cell are averaged
     (sum / count; empty cells contribute zero).
  4. kernel matmul: ``y_i = sum_k W_k @ xbar_k + b``.

The implementation is O(N*M) dense and differentiable by plain ``jax.grad``;
it is the ground truth against which the fused Pallas kernel
(``pointwise_tpu.kernels.pointwise_conv_pallas``) is verified, forward and
backward (SURVEY.md section 4 test strategy, tier 1).

Gradients w.r.t. point coordinates are not part of the operator contract
(the reference networks train only weights/features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_CELLS = 27


def cell_index(rel: jnp.ndarray, radius: float) -> jnp.ndarray:
    """3x3x3 cell id for relative coordinates ``rel`` (..., 3) in [-r, r]^3.

    Points exactly on the +r boundary are clamped into the outermost cell.
    """
    c = jnp.clip(jnp.floor((rel + radius) * (3.0 / (2.0 * radius))), 0.0, 2.0)
    c = c.astype(jnp.int32)
    return c[..., 0] * 9 + c[..., 1] * 3 + c[..., 2]


def _conv_one(centers, points, features, weights, bias, radius, mask,
              center_mask, ext_counts=None):
    """Single-cloud pointwise conv. centers (Nc,3), points (M,3), features (M,Cin).

    ext_counts: optional (Nc, 27) EXTERNAL divisor counts — the partial-conv
    contract (see ops.pointwise_conv ``ext_counts``): with global counts
    fixed, outputs over disjoint candidate subsets sum to the full conv.
    """
    rel = points[None, :, :] - centers[:, None, :]          # (Nc, M, 3) = p_j - p_i
    d2 = jnp.sum(rel * rel, axis=-1)                        # (Nc, M)
    valid = d2 <= jnp.asarray(radius, d2.dtype) ** 2
    if mask is not None:
        valid = jnp.logical_and(valid, mask.astype(bool)[None, :])
    cell = cell_index(rel, radius)                          # (Nc, M)
    onehot = jax.nn.one_hot(cell, N_CELLS, dtype=features.dtype)
    onehot = onehot * valid.astype(features.dtype)[..., None]   # (Nc, M, 27)
    sums = jnp.einsum("imk,mc->ikc", onehot, features)      # (Nc, 27, Cin)
    cnt = jnp.sum(onehot, axis=1) if ext_counts is None else ext_counts
    xbar = sums / jnp.maximum(cnt, 1.0)[..., None]
    y = jnp.einsum("ikc,kcd->id", xbar, weights)            # (Nc, Cout)
    if bias is not None:
        y = y + bias
    if center_mask is not None:
        y = y * center_mask.astype(y.dtype)[:, None]
    return y


def pointwise_conv_reference(
    points: jnp.ndarray,
    features: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    radius: float,
    mask: jnp.ndarray | None = None,
    centers: jnp.ndarray | None = None,
    center_mask: jnp.ndarray | None = None,
    ext_counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dense reference pointwise convolution.

    Args:
      points: (M, 3) or (B, M, 3) candidate point positions.
      features: (M, Cin) or (B, M, Cin) features of the candidate points.
      weights: (27, Cin, Cout) kernel-cell weights.
      bias: optional (Cout,).
      radius: kernel support radius (static Python float).
      mask: optional (M,) / (B, M) validity of candidates (0 = padding).
      centers: optional (Nc, 3) / (B, Nc, 3) convolution centers; defaults to
        ``points`` (the reference op: every point is a center, no
        downsampling).
      center_mask: optional validity of centers; masked centers output 0.

    Returns:
      (Nc, Cout) or (B, Nc, Cout) output features.
    """
    batched = points.ndim == 3
    if not batched:
        points, features = points[None], features[None]
        mask = None if mask is None else mask[None]
        centers = None if centers is None else centers[None]
        center_mask = None if center_mask is None else center_mask[None]
        ext_counts = None if ext_counts is None else ext_counts[None]
    if centers is None:
        centers = points
        if center_mask is None:
            center_mask = mask

    def one(c, p, f, m, cm, ec):
        return _conv_one(c, p, f, weights, bias, radius, m, cm, ec)

    in_axes = (0, 0, 0, None if mask is None else 0,
               None if center_mask is None else 0,
               None if ext_counts is None else 0)
    y = jax.vmap(one, in_axes=in_axes)(centers, points, features, mask,
                                       center_mask, ext_counts)
    return y if batched else y[0]
