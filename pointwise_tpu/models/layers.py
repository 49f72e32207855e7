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


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch moments IGNORE masked (padding) rows.

    ``nn.BatchNorm`` reduces over every non-feature dim, so zeroed padding
    rows drag the moments toward zero in proportion to the padding fraction
    (two batches with the same real points but different pad lengths
    normalize differently).  The shipped block pipelines resample tails
    instead of padding (mask is all ones there), but user-built padded
    batches must normalize by masked statistics.

    Variable layout is nn.BatchNorm-compatible (params ``scale``/``bias``,
    batch_stats ``mean``/``var``) and the block below pins the submodule
    name, so checkpoints are interchangeable with the previous
    nn.BatchNorm.  ``axis_names``: mesh axes to psum the moment sums over
    (inside shard_map — the SPMD analog of nn.BatchNorm's ``axis_name``).
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    axis_names: tuple = ()

    @nn.compact
    def __call__(self, x, mask=None):
        import jax

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            m = (jnp.ones(x.shape[:-1], jnp.float32) if mask is None
                 else mask.astype(jnp.float32))[..., None]
            red = tuple(range(x.ndim - 1))
            cnt = jnp.sum(m, red)
            s = jnp.sum(xf * m, red)
            s2 = jnp.sum(xf * xf * m, red)
            for ax in self.axis_names:
                cnt = jax.lax.psum(cnt, ax)
                s = jax.lax.psum(s, ax)
                s2 = jax.lax.psum(s2, ax)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


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
            # name pinned to nn.BatchNorm's auto-name: checkpoints trained
            # with the pre-masked-moments BatchNorm restore unchanged
            y = MaskedBatchNorm(use_running_average=not train,
                                axis_names=tuple(self.bn_axes),
                                name="BatchNorm_0")(
                y, mask if centers is None else center_mask)
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
