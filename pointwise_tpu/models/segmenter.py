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
    """Per-point logits over num_classes for every input point.

    setup-style (not compact) so that ``streaming_logits`` — the
    shrinking-halo forward used by the exact streaming engine — can share
    the same parameters as ``__call__``.  Submodule names are pinned to the
    historical compact autonames, so checkpoints are layout-compatible
    regardless of ``remat``.
    """

    num_classes: int
    # all-124 trunk: lane-filling at zero time cost (see classifier)
    channels: Sequence[int] = (124, 124, 124, 124)
    radii: Sequence[float] = (0.1, 0.2, 0.4, 0.8)    # block-normalized coords
    head_dims: Sequence[int] = (256, 128)
    dropout_rate: float = 0.3
    norm: str = "layer"
    impl: str = "auto"
    precision: str = "bfloat16"
    remat: bool = False   # rematerialize conv blocks (memory <- FLOPs)
    use_global_context: bool = True
    # mesh axis name(s) the POINT dim is sharded over (inside shard_map);
    # makes the global-context pool reduce across spatial shards (psum/pmax)
    context_axes: Sequence[str] = ()
    # mesh axis name(s) to sync BatchNorm statistics over (shard_map only)
    bn_axes: Sequence[str] = ()

    def setup(self):
        block_cls = (
            nn.remat(PointwiseConvBlock, static_argnums=(4,))
            if self.remat else PointwiseConvBlock
        )
        self.blocks = [
            block_cls(c, r, impl=self.impl, norm=self.norm,
                      precision=self.precision, bn_axes=tuple(self.bn_axes),
                      name=f"PointwiseConvBlock_{i}")
            for i, (c, r) in enumerate(zip(self.channels, self.radii, strict=True))
        ]
        self.head = [
            nn.Dense(d, name=f"Dense_{i}") for i, d in enumerate(self.head_dims)
        ]
        self.head_drop = [nn.Dropout(self.dropout_rate) for _ in self.head_dims]
        self.out = nn.Dense(self.num_classes, name=f"Dense_{len(self.head_dims)}")

    def __call__(self, points, features=None, mask=None, train: bool = False):
        """points (B,N,3); features (B,N,C) or None -> xyz; out (B,N,classes)."""
        x = points if features is None else features
        skips = []
        for blk in self.blocks:
            x = blk(points, x, mask, train)
            skips.append(x)
        h = jnp.concatenate(skips, axis=-1)           # (B, N, sum(C))
        if self.use_global_context:
            g = masked_pool(x, mask, tuple(self.context_axes) or None)  # (B, 2C_last)
            g = jnp.broadcast_to(g[:, None, :], (h.shape[0], h.shape[1], g.shape[-1]))
            h = jnp.concatenate([h, g], axis=-1)
        return self._head(h, mask, train)

    def _head(self, h, mask, train):
        for dense, drop in zip(self.head, self.head_drop):
            h = nn.relu(dense(h))
            h = drop(h, deterministic=not train)
        logits = self.out(h)
        if mask is not None:
            logits = logits * mask.astype(logits.dtype)[..., None]
        return logits

    def streaming_logits(self, points, features, counts, sels, skips, *,
                         lengths):
        """Shrinking-halo forward for exact streaming (overlap-save) eval.

        Instead of convolving every layer over the full tile+halo candidate
        set, layer ``l`` computes outputs only where later layers still need
        them (within the remaining receptive field).  The candidate arrays
        stay in global morton order — compact kernel tiles — and each
        layer's needed subset is a device-side index GATHER of the previous
        one (see streaming.stream_apply_layered / _nested_candidates).

        Args:
          points/features: (B, p_0, ...) morton-ordered, padded tile arrays.
          counts: (B, L+1) int32 — true set sizes n_0 >= ... >= n_L per tile
            (n_0 = all candidates, n_L = tile interior).  Slots beyond
            ``counts[:, l]`` are masked out of layer ``l``.
          sels: tuple of L int32 arrays; sels[l] (B, p_{l+1}) = positions,
            within layer l's candidate array, of layer l's centers S_{l+1}.
          skips: tuple of L int32 arrays; skips[l] (B, p_L) = positions,
            within layer l's OUTPUT array, of the tile interior (for the
            dense-skip concat feeding the head).
          lengths: static non-increasing tuple (p_0, ..., p_L) of padded
            array lengths per depth.

        Returns (B, p_L, num_classes) logits; slots ``>= counts[:, L]`` are
        zero.  Exact iff the engine's halos satisfy halo_l >= sum(radii[l:])
        (overlap-save argument, streaming.py module docstring) and
        use_global_context=False.
        """
        if self.use_global_context:
            raise ValueError(
                "streaming_logits requires use_global_context=False "
                "(the global pool is not a local computation)"
            )
        if len(lengths) != len(self.blocks) + 1:
            raise ValueError(
                f"lengths must have {len(self.blocks) + 1} entries, "
                f"got {len(lengths)}"
            )
        iota = jnp.arange(lengths[0], dtype=jnp.int32)

        def prefix_mask(level, p):
            return (iota[:p][None, :] < counts[:, level:level + 1]).astype(
                jnp.float32
            )

        def gather(arr, idx):
            return jnp.take_along_axis(arr, idx[..., None], axis=1)

        x = points if features is None else features
        pts_cur = points
        p_last = lengths[-1]
        skip_feats = []
        for l, blk in enumerate(self.blocks):
            ctr = gather(pts_cur, sels[l])            # (B, p_{l+1}, 3)
            x = blk(pts_cur, x, prefix_mask(l, lengths[l]),
                    False, ctr, prefix_mask(l + 1, lengths[l + 1]))
            skip_feats.append(gather(x, skips[l]))    # (B, p_L, C_l)
            pts_cur = ctr
        h = jnp.concatenate(skip_feats, axis=-1)      # (B, p_L, sum(C))
        return self._head(h, prefix_mask(len(self.blocks), p_last), False)


class ShapeNetPartSegmenter(nn.Module):
    """Part segmentation conditioned on the object category (one-hot).

    Deeper conv stack than the semantic nets (exercises longer kernel
    pipelines); the category embedding is broadcast and concatenated into the
    per-point head.
    """

    num_parts: int = 50
    num_categories: int = 16
    channels: Sequence[int] = (124, 124, 124, 124, 124, 124)
    radii: Sequence[float] = (0.15, 0.25, 0.4, 0.6, 0.9, 1.4)
    head_dims: Sequence[int] = (256, 128)
    dropout_rate: float = 0.3
    norm: str = "layer"
    impl: str = "auto"
    precision: str = "bfloat16"
    remat: bool = False   # rematerialize conv blocks (memory <- FLOPs);
                          # NOTE: changes param scope names, so checkpoints
                          # are tied to the remat setting
    # mesh axis name(s) the POINT dim is sharded over (inside shard_map)
    context_axes: Sequence[str] = ()
    # mesh axis name(s) to sync BatchNorm statistics over (shard_map only)
    bn_axes: Sequence[str] = ()

    @nn.compact
    def __call__(self, points, category, features=None, mask=None, train: bool = False):
        """category: (B,) int ids. Returns (B, N, num_parts)."""
        x = points if features is None else features
        skips = []
        block_cls = (
            nn.remat(PointwiseConvBlock, static_argnums=(4,))
            if self.remat else PointwiseConvBlock
        )
        for i, (c, r) in enumerate(zip(self.channels, self.radii, strict=True)):
            # name pinned so checkpoints survive toggling remat (matches
            # PointwiseSegmenter above)
            x = block_cls(c, r, impl=self.impl, norm=self.norm,
                          precision=self.precision,
                          bn_axes=tuple(self.bn_axes),
                          name=f"PointwiseConvBlock_{i}")(
                points, x, mask, train
            )
            skips.append(x)
        h = jnp.concatenate(skips, axis=-1)
        g = masked_pool(x, mask, tuple(self.context_axes) or None)
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


def segmentation_loss_sums(logits, labels, mask=None, class_weights=None):
    """SPMD (shard-local sums) variant of ``segmentation_loss``.

    Returns (nll_sum, weight, metric_sums) — the Trainer's space_axis
    contract: psum(nll_sum)/psum(weight) over the mesh equals the global
    masked mean exactly (a masked mean is not linear across shards, sums
    are).
    """
    logp = nn.log_softmax(logits)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        ll = ll * class_weights[labels]
    correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    m = (jnp.ones_like(ll) if mask is None else mask).astype(jnp.float32)
    return -jnp.sum(ll * m), jnp.sum(m), {"accuracy": jnp.sum(correct * m)}


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
