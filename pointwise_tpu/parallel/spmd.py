"""SPMD training over 2D (data x space) meshes.

Combines the two parallelism strategies this model family admits
(SURVEY.md section 2): batch-dim data parallelism and point-dim spatial
parallelism.  The actual machinery lives in ``train.trainer.Trainer``
(``space_axis=...``): the whole train/eval step runs inside ``shard_map`` —
each device holds a (batch-shard, point-shard), convolves its local centers
against candidates brought in over the `space` axis (parallel/spatial.py),
and loss/grads/metrics are psum'd as SUMS and normalized globally, so the
sharded step equals the unsharded global-mean step exactly.  Params and
optimizer state stay replicated — these nets are tiny; the data is what
scales.

Model requirements: ``impl='spatial:<space_axis>'`` and, when the net pools
globally (``use_global_context=True`` / the classifier head),
``context_axes=(space_axis,)`` so the pool reduces across spatial shards.

This module provides the per-model-family loss adapters implementing the
Trainer's SPMD sums contract (see Trainer docstring).
"""

from __future__ import annotations

from typing import Callable

import jax

from pointwise_tpu.models import (
    classification_loss_sums,
    segmentation_loss_sums,
)


def seg_spmd_loss_fn(model, *, jitter_sigma: float = 0.0,
                     jitter_clip: float = 0.02,
                     stateful: bool = False) -> Callable:
    """Sums-contract loss for a (spatially-shardable) segmentation model.

    Per-point Gaussian jitter is safe per-shard (iid noise); per-CLOUD
    geometric augmentation (rotations) must happen on the host instead.

    ``stateful=True`` (norm='batch'): implements the Trainer's SPMD
    model_state contract, threading the 'batch_stats' collection.  The
    model must be built with ``bn_axes=(batch_axis, space_axis)`` so its
    BatchNorm moments are GLOBAL (flax pmean's over the shard_map axes) —
    then the mutated stats are identical on every shard and the sharded
    step equals the unsharded one.
    """
    from pointwise_tpu.data import augment

    def _pts(batch, rng, train):
        pts = batch["points"]
        if train and jitter_sigma > 0:
            rng, rj = jax.random.split(rng)
            pts = augment.jitter(rj, pts, sigma=jitter_sigma, clip=jitter_clip)
        return pts, rng

    if stateful:
        def loss_fn(params, model_state, batch, rng, train):
            pts, rng = _pts(batch, rng, train)
            out = model.apply(
                {"params": params, "batch_stats": model_state}, pts,
                batch["features"], batch["mask"], train=train,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if train else False,
            )
            logits, mut = out if train else (out, None)
            loss_sum, w, sums = segmentation_loss_sums(
                logits, batch["label"], batch["mask"])
            new_ms = mut["batch_stats"] if train else model_state
            return loss_sum, w, (sums, new_ms)
    else:
        def loss_fn(params, batch, rng, train):
            pts, rng = _pts(batch, rng, train)
            logits = model.apply(
                {"params": params}, pts, batch["features"], batch["mask"],
                train=train, rngs={"dropout": rng},
            )
            return segmentation_loss_sums(logits, batch["label"],
                                          batch["mask"])

    return loss_fn


def cls_spmd_loss_fn(model) -> Callable:
    """Sums-contract loss for a (spatially-shardable) classifier.

    The classifier's only rng use is HEAD dropout, applied after the pooled
    features are made identical on every space shard by the context
    reduction — so the Trainer must be constructed with
    ``rng_axes=(batch_axis,)``: folding the space index in too would draw a
    different mask per space shard for the same replicated computation, and
    the sharded step would no longer equal the unsharded one at
    dropout_rate > 0.
    """

    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            {"params": params}, batch["points"], train=train,
            rngs={"dropout": rng},
        )
        return classification_loss_sums(logits, batch["label"])

    return loss_fn
