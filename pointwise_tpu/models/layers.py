"""Flax layers wrapping the pointwise convolution op.

Rebuild of the reference's L2 Python op wrapper + L3 building blocks
(SURVEY.md section 1): a `PointwiseConv` module owning the (27, Cin, Cout)
kernel-cell weights, plus the conv->norm->activation block the reference
networks stack four (or more) times with growing radius.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from pointwise_tpu.ops.pointwise_conv import pointwise_conv


class PointwiseConv(nn.Module):
    """One pointwise convolution: 27 kernel cells over a radius-r support.

    ``precision='bfloat16'`` (default) runs the kernel's masked matmuls in
    bf16 with f32 accumulation — the cell masks are exact in bf16, only the
    features round (~1e-3 rel), which training absorbs; pass 'float32' for
    bit-level parity work.
    """

    features: int
    radius: float
    use_bias: bool = True
    impl: str = "auto"
    precision: str = "bfloat16"

    @nn.compact
    def __call__(self, points, x, mask=None, centers=None, center_mask=None):
        cin = x.shape[-1]
        # fan_in = 27 * cin receptive inputs, matching conv-style init.
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (27, cin, self.features)
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return pointwise_conv(
            points, x, w, b, radius=self.radius, mask=mask, impl=self.impl,
            centers=centers, center_mask=center_mask,
            precision=self.precision,
        )


class PointwiseConvBlock(nn.Module):
    """conv -> norm -> activation, the trunk unit of all reference nets."""

    features: int
    radius: float
    impl: str = "auto"
    norm: str = "layer"          # 'layer' | 'batch' | 'none'
    precision: str = "bfloat16"
    activation: Callable = nn.relu
    # mesh axis name(s) to sync BatchNorm batch statistics over (inside
    # shard_map: ('data', 'space') makes the moments GLOBAL, so a spatially
    # sharded step normalizes identically to the unsharded one).  Under
    # plain-jit data parallelism leave empty — XLA inserts the collectives
    # for the global-batch reduction itself.
    bn_axes: tuple = ()

    @nn.compact
    def __call__(self, points, x, mask=None, train: bool = False,
                 centers=None, center_mask=None):
        y = PointwiseConv(self.features, self.radius, impl=self.impl,
                          precision=self.precision)(
            points, x, mask, centers, center_mask
        )
        if self.norm == "layer":
            y = nn.LayerNorm()(y)
        elif self.norm == "batch":
            y = nn.BatchNorm(use_running_average=not train,
                             axis_name=tuple(self.bn_axes) or None)(y)
        elif self.norm != "none":
            raise ValueError(f"unknown norm: {self.norm!r}")
        y = self.activation(y)
        out_mask = mask if centers is None else center_mask
        if out_mask is not None:
            y = y * out_mask.astype(y.dtype)[..., None]
        return y


def masked_pool(x: jnp.ndarray, mask: jnp.ndarray | None, axes=None):
    """Concat of masked max-pool and mean-pool over the point dim.

    x: (B, N, C); mask: (B, N) or None. Returns (B, 2C).

    ``axes``: optional mesh axis name(s) the POINT dim is sharded over
    (inside shard_map) — the pool then reduces across those shards with
    pmax/psum, making the global context exact under spatial sharding.
    """
    import jax

    if mask is None:
        mask = jnp.ones(x.shape[:2], x.dtype)
    m = mask.astype(x.dtype)[..., None]
    neg = jnp.finfo(x.dtype).min
    xmax = jnp.max(jnp.where(m > 0, x, neg), axis=1)
    xsum = jnp.sum(x * m, axis=1)
    cnt = jnp.sum(m, axis=1)
    if axes:
        # all_gather + local max (pmax has no differentiation rule)
        xmax = jnp.max(jax.lax.all_gather(xmax, axes), axis=0)
        xsum = jax.lax.psum(xsum, axes)
        cnt = jax.lax.psum(cnt, axes)
    xmean = xsum / jnp.maximum(cnt, 1.0)
    return jnp.concatenate([xmax, xmean], axis=-1)
