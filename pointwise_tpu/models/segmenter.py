"""Per-point semantic segmentation networks (SceneNN / S3DIS / ShapeNetPart).

Rebuild of the reference's segmentation graph (SURVEY.md C5): the same
pointwise-conv trunk as classification, with features from every trunk layer
concatenated (dense skip) into a per-point classifier head.  The ShapeNetPart
variant additionally conditions on a one-hot object category and uses a
deeper trunk (BASELINE.json config 4 — a new head, not present in the
reference).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointwise_tpu.models.layers import PointwiseConvBlock, masked_pool


class PointwiseSegmenter(nn.Module):
    """Per-point logits over num_classes for every input point."""

    num_classes: int
    channels: Sequence[int] = (64, 64, 96, 124)
    radii: Sequence[float] = (0.1, 0.2, 0.4, 0.8)    # block-normalized coords
    head_dims: Sequence[int] = (256, 128)
    dropout_rate: float = 0.3
    norm: str = "layer"
    impl: str = "auto"
    precision: str = "bfloat16"
    remat: bool = False   # rematerialize conv blocks (memory <- FLOPs);
                          # NOTE: changes param scope names, so checkpoints
                          # are tied to the remat setting
    use_global_context: bool = True

    @nn.compact
    def __call__(self, points, features=None, mask=None, train: bool = False):
        """points (B,N,3); features (B,N,C) or None -> xyz; out (B,N,classes)."""
        x = points if features is None else features
        skips = []
        block_cls = (
            nn.remat(PointwiseConvBlock, static_argnums=(4,))
            if self.remat else PointwiseConvBlock
        )
        for c, r in zip(self.channels, self.radii):
            x = block_cls(c, r, impl=self.impl, norm=self.norm,
                          precision=self.precision)(
                points, x, mask, train
            )
            skips.append(x)
        h = jnp.concatenate(skips, axis=-1)           # (B, N, sum(C))
        if self.use_global_context:
            g = masked_pool(x, mask)                  # (B, 2C_last)
            g = jnp.broadcast_to(g[:, None, :], (h.shape[0], h.shape[1], g.shape[-1]))
            h = jnp.concatenate([h, g], axis=-1)
        for d in self.head_dims:
            h = nn.relu(nn.Dense(d)(h))
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes)(h)
        if mask is not None:
            logits = logits * mask.astype(logits.dtype)[..., None]
        return logits


class ShapeNetPartSegmenter(nn.Module):
    """Part segmentation conditioned on the object category (one-hot).

    Deeper conv stack than the semantic nets (exercises longer kernel
    pipelines); the category embedding is broadcast and concatenated into the
    per-point head.
    """

    num_parts: int = 50
    num_categories: int = 16
    channels: Sequence[int] = (64, 64, 96, 96, 124, 124)
    radii: Sequence[float] = (0.15, 0.25, 0.4, 0.6, 0.9, 1.4)
    head_dims: Sequence[int] = (256, 128)
    dropout_rate: float = 0.3
    norm: str = "layer"
    impl: str = "auto"
    precision: str = "bfloat16"
    remat: bool = False   # rematerialize conv blocks (memory <- FLOPs);
                          # NOTE: changes param scope names, so checkpoints
                          # are tied to the remat setting

    @nn.compact
    def __call__(self, points, category, features=None, mask=None, train: bool = False):
        """category: (B,) int ids. Returns (B, N, num_parts)."""
        x = points if features is None else features
        skips = []
        block_cls = (
            nn.remat(PointwiseConvBlock, static_argnums=(4,))
            if self.remat else PointwiseConvBlock
        )
        for c, r in zip(self.channels, self.radii):
            x = block_cls(c, r, impl=self.impl, norm=self.norm,
                          precision=self.precision)(
                points, x, mask, train
            )
            skips.append(x)
        h = jnp.concatenate(skips, axis=-1)
        g = masked_pool(x, mask)
        onehot = jax.nn.one_hot(category, self.num_categories, dtype=h.dtype)
        cat = nn.Dense(64)(onehot)
        g = jnp.concatenate([g, cat], axis=-1)
        g = jnp.broadcast_to(g[:, None, :], (h.shape[0], h.shape[1], g.shape[-1]))
        h = jnp.concatenate([h, g], axis=-1)
        for d in self.head_dims:
            h = nn.relu(nn.Dense(d)(h))
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        logits = nn.Dense(self.num_parts)(h)
        if mask is not None:
            logits = logits * mask.astype(logits.dtype)[..., None]
        return logits


def segmentation_loss(logits, labels, mask=None, num_classes=None, class_weights=None):
    """Masked per-point softmax CE + accuracy. labels (B,N) int, mask (B,N)."""
    logp = nn.log_softmax(logits)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        ll = ll * class_weights[labels]
    correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    if mask is None:
        return -jnp.mean(ll), jnp.mean(correct)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.sum(ll * m) / denom, jnp.sum(correct * m) / denom
