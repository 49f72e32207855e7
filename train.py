#!/usr/bin/env python
"""Training CLI (rebuild of the reference's per-workload train_*.py scripts).

Examples:
  python train.py --config modelnet40_synthetic --steps 200
  python train.py --config modelnet40 --data-dir /data/modelnet40_ply_hdf5_2048
  python train.py --config s3dis_synthetic --steps 500
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp

from pointwise_tpu.data import augment, modelnet, pipeline
from pointwise_tpu.models import (
    PointwiseClassifier,
    PointwiseSegmenter,
    classification_loss,
    segmentation_loss,
)
from pointwise_tpu.train import get_config
from pointwise_tpu.train.configs import ClassificationConfig, SegmentationConfig
from pointwise_tpu.train.trainer import SummaryWriter, Trainer, log_metrics


def build_classifier(cfg: ClassificationConfig):
    model = PointwiseClassifier(
        num_classes=cfg.num_classes,
        channels=cfg.channels,
        radii=cfg.radii,
        head_dims=cfg.head_dims,
        dropout_rate=cfg.dropout,
        norm=cfg.norm,
        impl=cfg.impl,
    )

    def loss_fn(params, batch, rng, train):
        pts = batch["points"]
        if train:
            rng_aug, rng_drop = jax.random.split(rng)
            pts = augment.classification_augment(
                rng_aug, pts, rotate=cfg.rotate_augment
            )
        else:
            rng_drop = rng
        logits = model.apply(
            {"params": params}, pts, train=train, rngs={"dropout": rng_drop}
        )
        loss, acc = classification_loss(logits, batch["label"])
        return loss, {"accuracy": acc}

    return model, loss_fn


def train_classification(cfg: ClassificationConfig, args):
    train_data = modelnet.load_modelnet40(
        cfg.data_dir or args.data_dir, "train", cfg.num_points, seed=cfg.seed
    )
    test_data = modelnet.load_modelnet40(
        cfg.data_dir or args.data_dir, "test", cfg.num_points,
        synthetic_size=128, seed=cfg.seed,
    )
    if train_data.num_classes != cfg.num_classes:
        cfg = dataclasses.replace(cfg, num_classes=train_data.num_classes)

    model, loss_fn = build_classifier(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    sample = {
        "points": jnp.zeros((cfg.batch_size, cfg.num_points, 3)),
        "label": jnp.zeros((cfg.batch_size,), jnp.int32),
    }
    params = jax.jit(lambda r: model.init(r, sample["points"], train=False))(rng)["params"]
    trainer = Trainer(loss_fn, params, cfg.optimizer, mesh=_mesh(args))
    writer = SummaryWriter(args.tensorboard)
    if args.resume and cfg.checkpoint_dir:
        start = trainer.restore_checkpoint(cfg.checkpoint_dir)
        print(f"# resumed at step {start}", flush=True)

    t0 = time.time()
    step = int(jax.device_get(trainer.state.step))
    max_steps = args.steps or cfg.epochs * (len(train_data.labels) // cfg.batch_size)
    epoch = 0
    while step < max_steps:
        it = modelnet.batches(train_data, cfg.batch_size, seed=cfg.seed + epoch)
        for batch in pipeline.prefetch_to_device(it):
            rng, rs = jax.random.split(rng)
            metrics = trainer.step(batch, rs)
            step += 1
            if step % cfg.log_every == 0 or step == 1:
                log_metrics(step, jax.device_get(metrics), t0=t0, writer=writer)
            if step % cfg.eval_every == 0 or step == max_steps:
                ev = trainer.evaluate(
                    pipeline.prefetch_to_device(
                        modelnet.batches(test_data, cfg.batch_size, shuffle=False)
                    ),
                    rng,
                )
                log_metrics(step, ev, t0=t0, extra={"split": "test"},
                            writer=writer, prefix="eval/")
            if cfg.checkpoint_dir and step % cfg.checkpoint_every == 0:
                trainer.save_checkpoint(cfg.checkpoint_dir, cfg.keep_checkpoints)
            if step >= max_steps:
                break
        epoch += 1
    if cfg.checkpoint_dir:
        trainer.save_checkpoint(cfg.checkpoint_dir, cfg.keep_checkpoints)
    return trainer


def train_segmentation(cfg: SegmentationConfig, args):
    from pointwise_tpu.data import s3dis

    blocks = s3dis.training_blocks(cfg, data_dir=cfg.data_dir or args.data_dir)
    # hold out ~10% of blocks for periodic eval
    n_blocks = len(blocks["points"])
    n_eval = max(cfg.batch_size, n_blocks // 10)
    eval_blocks = {k: v[:n_eval] for k, v in blocks.items()}
    blocks = {k: v[n_eval:] for k, v in blocks.items()}
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes,
        channels=cfg.channels,
        radii=cfg.radii,
        head_dims=cfg.head_dims,
        dropout_rate=cfg.dropout,
        norm=cfg.norm,
        impl=cfg.impl,
        use_global_context=cfg.global_context,
    )

    def loss_fn(params, batch, rng, train):
        pts = batch["points"]
        if train:
            rng, rj = jax.random.split(rng)
            pts = augment.jitter(rj, pts, sigma=0.005, clip=0.02)
        logits = model.apply(
            {"params": params},
            pts,
            batch["features"],
            batch["mask"],
            train=train,
            rngs={"dropout": rng},
        )
        loss, acc = segmentation_loss(logits, batch["label"], batch["mask"])
        return loss, {"accuracy": acc}

    rng = jax.random.PRNGKey(cfg.seed)
    sample = s3dis.batch_template(cfg)
    params = jax.jit(
        lambda r: model.init(
            r, sample["points"], sample["features"], sample["mask"], train=False
        )
    )(rng)["params"]
    trainer = Trainer(loss_fn, params, cfg.optimizer, mesh=_mesh(args))
    writer = SummaryWriter(args.tensorboard)

    t0 = time.time()
    step = 0
    max_steps = args.steps or cfg.epochs * max(1, len(blocks["points"]) // cfg.batch_size)
    epoch = 0
    while step < max_steps:
        it = s3dis.block_batches(blocks, cfg.batch_size, seed=cfg.seed + epoch)
        for batch in pipeline.prefetch_to_device(it):
            rng, rs = jax.random.split(rng)
            metrics = trainer.step(batch, rs)
            step += 1
            if step % cfg.log_every == 0 or step == 1:
                log_metrics(step, jax.device_get(metrics), t0=t0, writer=writer)
            if step % cfg.eval_every == 0 or step == max_steps:
                ev = trainer.evaluate(
                    pipeline.prefetch_to_device(
                        s3dis.block_batches(eval_blocks, cfg.batch_size,
                                            shuffle=False)
                    ),
                    rng,
                )
                log_metrics(step, ev, t0=t0, extra={"split": "heldout_blocks"},
                            writer=writer, prefix="eval/")
            if cfg.checkpoint_dir and step % cfg.checkpoint_every == 0:
                trainer.save_checkpoint(cfg.checkpoint_dir, cfg.keep_checkpoints)
            if step >= max_steps:
                break
        epoch += 1
    if cfg.checkpoint_dir:
        trainer.save_checkpoint(cfg.checkpoint_dir, cfg.keep_checkpoints)
    return trainer


def train_shapenetpart(cfg: SegmentationConfig, args):
    from pointwise_tpu.data import shapenetpart
    from pointwise_tpu.models import ShapeNetPartSegmenter

    data = shapenetpart.load_shapenetpart(
        cfg.data_dir or args.data_dir, "train", cfg.num_points, seed=cfg.seed
    )
    model = ShapeNetPartSegmenter(
        num_parts=data.num_parts,
        num_categories=data.num_categories,
        channels=cfg.channels,
        radii=cfg.radii,
        head_dims=cfg.head_dims,
        dropout_rate=cfg.dropout,
        norm=cfg.norm,
        impl=cfg.impl,
    )

    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            {"params": params}, batch["points"], batch["category"],
            mask=batch["mask"], train=train, rngs={"dropout": rng},
        )
        loss, acc = segmentation_loss(logits, batch["label"], batch["mask"])
        return loss, {"accuracy": acc}

    rng = jax.random.PRNGKey(cfg.seed)
    sample = {
        "points": jnp.zeros((cfg.batch_size, cfg.num_points, 3)),
        "category": jnp.zeros((cfg.batch_size,), jnp.int32),
        "mask": jnp.ones((cfg.batch_size, cfg.num_points)),
    }
    params = jax.jit(
        lambda r: model.init(
            r, sample["points"], sample["category"], mask=sample["mask"],
            train=False,
        )
    )(rng)["params"]
    trainer = Trainer(loss_fn, params, cfg.optimizer)

    t0 = time.time()
    step = 0
    max_steps = args.steps or cfg.epochs * max(1, len(data.category) // cfg.batch_size)
    epoch = 0
    while step < max_steps:
        it = shapenetpart.batches(data, cfg.batch_size, seed=cfg.seed + epoch)
        for batch in pipeline.prefetch_to_device(it):
            rng, rs = jax.random.split(rng)
            metrics = trainer.step(batch, rs)
            step += 1
            if step % cfg.log_every == 0 or step == 1:
                log_metrics(step, jax.device_get(metrics), t0=t0)
            if step >= max_steps:
                break
        epoch += 1
    if cfg.checkpoint_dir:
        trainer.save_checkpoint(cfg.checkpoint_dir, cfg.keep_checkpoints)
    return trainer


def _mesh(args):
    """Data-parallel mesh over all local devices when --dp is set."""
    if not getattr(args, "dp", False):
        return None
    from pointwise_tpu.parallel import make_mesh

    mesh = make_mesh()
    print(f"# data-parallel over {mesh.shape['data']} devices", flush=True)
    return mesh


def train_segmentation_spmd(cfg: SegmentationConfig, args):
    """Spatially-sharded segmentation training: mesh = (data, space=--sp)."""
    import optax

    from pointwise_tpu.data import s3dis
    from pointwise_tpu.parallel import make_mesh
    from pointwise_tpu.parallel.spmd import make_spatial_seg_train_step

    mesh = make_mesh(space=args.sp)
    print(f"# spmd mesh data:{mesh.shape['data']} x space:{mesh.shape['space']}",
          flush=True)
    blocks = s3dis.training_blocks(cfg, data_dir=cfg.data_dir or args.data_dir)
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=0.0, norm=cfg.norm,
        impl="spatial:space", use_global_context=False,
    )
    init_model = model.clone(impl=cfg.impl)
    sample = s3dis.batch_template(cfg)
    params = jax.jit(
        lambda r: init_model.init(r, sample["points"], sample["features"],
                                  sample["mask"], train=False)
    )(jax.random.PRNGKey(cfg.seed))["params"]
    from pointwise_tpu.train.trainer import make_optimizer

    tx = make_optimizer(cfg.optimizer)
    opt_state = tx.init(params)
    put, step = make_spatial_seg_train_step(model, tx, mesh)

    t0 = time.time()
    n = 0
    max_steps = args.steps or 100
    while n < max_steps:
        for batch in s3dis.block_batches(blocks, cfg.batch_size,
                                         seed=cfg.seed + n):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if n == 0:
                params, opt_state, batch = put(params, opt_state, batch)
            params, opt_state, loss = step(params, opt_state, batch)
            n += 1
            if n % cfg.log_every == 0 or n == 1:
                log_metrics(n, {"loss": float(jax.device_get(loss))}, t0=t0)
            if n >= max_steps:
                break
    return params


def main():
    from pointwise_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="modelnet40_synthetic")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--steps", type=int, default=None, help="override total steps")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tensorboard", default=None,
                    help="optional tf.summary logdir")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--sp", type=int, default=0,
                    help="spatial shards for segmentation training "
                         "(mesh = data x space; needs locality-only nets)")
    args = ap.parse_args()

    cfg = get_config(args.config)
    if cfg.norm == "batch":
        raise ValueError(
            "norm='batch' needs flax mutable batch_stats threading, which the "
            "bundled Trainer does not do; use norm='layer'/'none', or write a "
            "custom loop with model.apply(..., mutable=['batch_stats']) "
            "(see tests/test_models.py::test_batchnorm_mutable_path)."
        )
    if args.checkpoint_dir:
        cfg = dataclasses.replace(cfg, checkpoint_dir=args.checkpoint_dir)
    print(f"# config={args.config} backend={jax.default_backend()} "
          f"devices={len(jax.devices())}", flush=True)
    if isinstance(cfg, ClassificationConfig):
        train_classification(cfg, args)
    elif cfg.name.startswith("shapenetpart"):
        train_shapenetpart(cfg, args)
    elif args.sp and args.sp > 1:
        train_segmentation_spmd(cfg, args)
    else:
        train_segmentation(cfg, args)


if __name__ == "__main__":
    main()
