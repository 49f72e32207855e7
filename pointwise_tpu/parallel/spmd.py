"""SPMD training over 2D (data x space) meshes.

Combines the two parallelism strategies this model family admits
(SURVEY.md section 2): batch-dim data parallelism and point-dim spatial
parallelism.  The whole train step runs inside ``shard_map``: each device
holds a (batch-shard, point-shard) of the block batch, convolves its local
centers against candidates brought in over the `space` axis (see
parallel/spatial.py), computes the weighted-loss contribution, and grads
are psum'd over both axes.  Params and optimizer state stay replicated —
these nets are tiny; the data is what scales.

Scope note: the segmentation model must be built with
``impl="spatial:<axis>"`` and ``use_global_context=False`` (cross-shard
pooling is not wired up).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointwise_tpu.models import segmentation_loss


def make_spatial_seg_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    space_axis: str = "space",
) -> tuple[Callable, Callable]:
    """Returns (put, step) for spatially-sharded segmentation training.

    put(params, opt_state, batch) -> device-placed copies.
    step(params, opt_state, batch) -> (params, opt_state, loss); jitted,
    batch dict must have points/features/label/mask with dims (B, N, ...).
    """
    axes = (data_axis, space_axis)

    def local_step(params, opt_state, batch):
        # denominator is data-only, so psum it OUTSIDE the differentiated
        # function: under shard_map a psum on the loss path transposes to a
        # psum, and an explicit grad psum would then double-count.
        total_cnt = jax.lax.psum(jnp.sum(batch["mask"]), axes)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, batch["points"], batch["features"],
                batch["mask"], train=False,
            )
            lmean, _ = segmentation_loss(logits, batch["label"], batch["mask"])
            cnt = jnp.sum(batch["mask"])
            return lmean * cnt / total_cnt   # local share of the global mean

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, axes)
        grads = jax.lax.psum(grads, axes)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    repl = P()
    batch_spec = {k: P(data_axis, space_axis)
                  for k in ("points", "features", "label", "mask")}
    step = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(repl, repl, batch_spec),
            out_specs=(repl, repl, repl),
            check_vma=False,
        )
    )

    def put(params, opt_state, batch):
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
        batch = jax.device_put(
            batch, {k: NamedSharding(mesh, v) for k, v in batch_spec.items()}
        )
        return params, opt_state, batch

    return put, step
