"""Point-cloud classification network (ModelNet40 workload).

Rebuild of the reference's classification graph (SURVEY.md C4 /
BASELINE.json config "ModelNet40 classification: 1024 pts, 4x pointwise-conv
+ FC head"): four stacked pointwise convolutions over the constant point set
with growing kernel radius (the receptive field grows by radius, never by
downsampling), then a pooled fully-connected head to 40-way logits.

TPU-first deltas from the reference (documented divergences, not omissions):
  * global aggregation is masked max+mean pooling instead of flattening the
    per-point feature map into a giant FC — same accuracy class, static
    shapes, and batch-size independent;
  * LayerNorm instead of TF-1 batch norm by default (config-switchable).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pointwise_tpu.models.layers import PointwiseConvBlock, masked_pool


class PointwiseClassifier(nn.Module):
    num_classes: int = 40
    # all-124 trunk: device time is FLAT from 64- to 124-wide layers
    # (the kernel is bound by the padded cin_p=128 matmul shape, GOLDEN
    # round-4 lane-filling table), so narrow early layers waste lanes
    # for zero time saving; 124 keeps cin+1 <= 128 (counts column)
    channels: Sequence[int] = (124, 124, 124, 124)
    radii: Sequence[float] = (0.25, 0.5, 1.0, 2.0)   # unit-sphere clouds
    head_dims: Sequence[int] = (256, 128)
    dropout_rate: float = 0.3
    norm: str = "layer"
    impl: str = "auto"
    precision: str = "bfloat16"
    remat: bool = False   # rematerialize conv blocks (memory <- FLOPs);
                          # NOTE: changes param scope names, so checkpoints
                          # are tied to the remat setting
    use_xyz_features: bool = True
    # mesh axis name(s) the POINT dim is sharded over (inside shard_map);
    # the pooled head then reduces across spatial shards (psum/pmax)
    context_axes: Sequence[str] = ()
    # mesh axis name(s) to sync BatchNorm statistics over (shard_map only)
    bn_axes: Sequence[str] = ()

    @nn.compact
    def __call__(self, points, features=None, mask=None, train: bool = False):
        """points (B,N,3); features optional (B,N,C); returns (B,num_classes)."""
        if features is None:
            if not self.use_xyz_features:
                raise ValueError("need features when use_xyz_features=False")
            x = points
        else:
            x = features
        block_cls = (
            nn.remat(PointwiseConvBlock, static_argnums=(4,))
            if self.remat else PointwiseConvBlock
        )
        for i, (c, r) in enumerate(zip(self.channels, self.radii, strict=True)):
            # name pinned so checkpoints survive toggling remat (the remat
            # wrapper changes the auto-generated scope name otherwise)
            x = block_cls(c, r, impl=self.impl, norm=self.norm,
                          precision=self.precision,
                          bn_axes=tuple(self.bn_axes),
                          name=f"PointwiseConvBlock_{i}")(
                points, x, mask, train
            )
        h = masked_pool(x, mask, tuple(self.context_axes) or None)   # (B, 2C)
        for d in self.head_dims:
            h = nn.relu(nn.Dense(d)(h))
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(self.num_classes)(h)


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray):
    """Softmax cross-entropy + accuracy. labels (B,) int."""
    logp = nn.log_softmax(logits)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss = -jnp.mean(ll)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, acc


def classification_loss_sums(logits: jnp.ndarray, labels: jnp.ndarray):
    """SPMD (shard-local sums) variant — the Trainer's space_axis contract:
    returns (nll_sum, weight, metric_sums); psum(sums)/psum(weight) over the
    mesh equals the global mean exactly."""
    logp = nn.log_softmax(logits)
    ll = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    w = jnp.asarray(labels.shape[0], jnp.float32)
    return -jnp.sum(ll), w, {"accuracy": jnp.sum(correct)}
