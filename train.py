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


def run_train_loop(trainer, cfg, args, *, make_epoch_iter, steps_per_epoch,
                   max_steps, eval_iter=None, eval_split="test", writer=None):
    """Deterministic, fully resumable training loop.

    The rng for step ``s`` is ``fold_in(rng_base, s)`` and the data epoch is
    ``s // steps_per_epoch`` (iterator fast-forwarded by ``s % steps_per_epoch``
    on entry), so a killed-and-resumed run replays the exact stream of an
    uninterrupted one (SURVEY.md section 5 checkpoint row).  Checkpoints carry
    the base PRNG key alongside {step, params, opt_state}.
    """
    import itertools

    rng_base = jax.random.PRNGKey(cfg.seed)
    if args.resume and cfg.checkpoint_dir:
        start = trainer.restore_checkpoint(
            cfg.checkpoint_dir, extra={"rng_base": jax.device_get(rng_base)}
        )
        if trainer.restored_extra is not None:
            rng_base = jnp.asarray(trainer.restored_extra["rng_base"])
        print(f"# resumed at step {start}", flush=True)
    ck_extra = {"rng_base": jax.device_get(rng_base)}

    t0 = time.time()
    step = int(jax.device_get(trainer.state.step))
    while step < max_steps:
        epoch = step // steps_per_epoch
        it = make_epoch_iter(epoch)
        skip = step % steps_per_epoch
        if skip:
            it = itertools.islice(it, skip, None)
        step_at_entry = step
        # lazy sharding: the Trainer's batch shardings exist after the first
        # step; from then on batches stage straight to their mesh placement
        for batch in pipeline.prefetch_to_device(
                it, sharding=lambda: getattr(trainer, "batch_sharding", None)):
            rs = jax.random.fold_in(rng_base, step)
            metrics = trainer.step(batch, rs)
            step += 1
            if step % cfg.log_every == 0 or step == 1:
                log_metrics(step, jax.device_get(metrics), t0=t0, writer=writer)
            if eval_iter is not None and (
                step % cfg.eval_every == 0 or step == max_steps
            ):
                ev = trainer.evaluate(
                    eval_iter(), jax.random.fold_in(rng_base, (1 << 30) + step)
                )
                log_metrics(step, ev, t0=t0, extra={"split": eval_split},
                            writer=writer, prefix="eval/")
            if cfg.checkpoint_dir and step % cfg.checkpoint_every == 0:
                trainer.save_checkpoint(cfg.checkpoint_dir,
                                        cfg.keep_checkpoints, extra=ck_extra)
            if step >= max_steps:
                break
        if step == step_at_entry:
            raise ValueError(
                "epoch iterator yielded no batches (dataset smaller than "
                f"batch_size after the {skip}-batch resume offset?) — "
                "training cannot make progress"
            )
    if cfg.checkpoint_dir:
        trainer.save_checkpoint(cfg.checkpoint_dir, cfg.keep_checkpoints,
                                extra=ck_extra)
    return trainer


def _wrap_forward(forward, stateful):
    """Adapt ``forward(variables, batch, rng, train, mutable) ->
    ((loss, metrics), mutated)`` to the Trainer's loss contract.

    stateful=True (norm='batch'): Trainer model_state contract, threading
    the 'batch_stats' collection; otherwise the plain (loss, metrics) one.
    """
    if stateful:
        def loss_fn(params, model_state, batch, rng, train):
            variables = {"params": params, "batch_stats": model_state}
            (loss, metrics), mut = forward(
                variables, batch, rng, train,
                ["batch_stats"] if train else False,
            )
            return loss, (metrics, mut["batch_stats"] if train else model_state)
    else:
        def loss_fn(params, batch, rng, train):
            (loss, metrics), _ = forward({"params": params}, batch, rng,
                                         train, False)
            return loss, metrics
    return loss_fn


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

    def forward(variables, batch, rng, train, mutable):
        pts = batch["points"]
        if train:
            rng_aug, rng_drop = jax.random.split(rng)
            pts = augment.classification_augment(
                rng_aug, pts, rotate=cfg.rotate_augment
            )
        else:
            rng_drop = rng
        out = model.apply(variables, pts, train=train,
                          rngs={"dropout": rng_drop}, mutable=mutable)
        logits, mut = out if mutable else (out, None)
        loss, acc = classification_loss(logits, batch["label"])
        return (loss, {"accuracy": acc}), mut

    return model, _wrap_forward(forward, cfg.norm == "batch")


def train_classification(cfg: ClassificationConfig, args):
    train_data = modelnet.load_modelnet40(
        cfg.data_dir or args.data_dir, "train", cfg.num_points, seed=cfg.seed,
        variant=cfg.variant,
    )
    test_data = modelnet.load_modelnet40(
        cfg.data_dir or args.data_dir, "test", cfg.num_points,
        synthetic_size=128, seed=cfg.seed, variant=cfg.variant,
    )
    # head wide enough for BOTH splits: a test class id absent from the
    # train split would otherwise be silently clamped by the in-loop eval
    # (eval.py widens explicitly; the loop here must match)
    ncls = max(train_data.num_classes, test_data.num_classes)
    if ncls != cfg.num_classes:
        cfg = dataclasses.replace(cfg, num_classes=ncls)

    model, loss_fn = build_classifier(cfg)
    sample = {
        "points": jnp.zeros((cfg.batch_size, cfg.num_points, 3)),
        "label": jnp.zeros((cfg.batch_size,), jnp.int32),
    }
    variables = jax.jit(lambda r: model.init(r, sample["points"], train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    trainer = Trainer(loss_fn, variables["params"], cfg.optimizer,
                      mesh=_mesh(args),
                      model_state=variables.get("batch_stats"))
    writer = SummaryWriter(args.tensorboard)

    steps_per_epoch = max(1, len(train_data.labels) // cfg.batch_size)
    return run_train_loop(
        trainer, cfg, args,
        make_epoch_iter=lambda epoch: modelnet.batches(
            train_data, cfg.batch_size, seed=cfg.seed + epoch
        ),
        steps_per_epoch=steps_per_epoch,
        max_steps=args.steps or cfg.epochs * steps_per_epoch,
        # keep the remainder on a single device (full-test-set protocol; the
        # tail shape costs one extra eval compile); a mesh needs divisible
        # batches, so --dp/--sp keep drop_remainder
        eval_iter=lambda: pipeline.prefetch_to_device(
            modelnet.batches(test_data, cfg.batch_size, shuffle=False,
                             drop_remainder=bool(args.dp or args.sp)),
            sharding=lambda: getattr(trainer, "batch_sharding", None),
        ),
        writer=writer,
    )


def train_segmentation(cfg: SegmentationConfig, args):
    from pointwise_tpu.data import s3dis, scenenn

    # hold out whole ROOMS for periodic eval: overlapping-stride blocks from
    # one room share points, so a block-level split would leak eval points
    # into training and bias the heldout metric optimistically.
    if cfg.name.startswith("scenenn"):
        # NYU-40 scene contract (real release or the 40-class procedural
        # stand-in) — the s3dis loader's 5-class rooms would leave the
        # 40-way head untrained past class 4 (eval.py matches this branch)
        rooms = scenenn.load_scenes(cfg.data_dir or args.data_dir,
                                    seed=cfg.seed)
    else:
        rooms = s3dis.load_rooms(cfg.data_dir or args.data_dir, seed=cfg.seed)
    if len(rooms) >= 2:
        n_eval_rooms = max(1, len(rooms) // 10)
        eval_blocks = s3dis.training_blocks(cfg, rooms=rooms[:n_eval_rooms])
        blocks = s3dis.training_blocks(cfg, rooms=rooms[n_eval_rooms:])
        print(f"# heldout rooms: {n_eval_rooms}/{len(rooms)}", flush=True)
    else:
        # single room: fall back to a block-level split (leaky; warned)
        print("# WARNING: single room — heldout blocks share points with "
              "training blocks", flush=True)
        blocks = s3dis.training_blocks(cfg, rooms=rooms)
        n_eval = max(cfg.batch_size, len(blocks["points"]) // 10)
        eval_blocks = {k: v[:n_eval] for k, v in blocks.items()}
        blocks = {k: v[n_eval:] for k, v in blocks.items()}
    sp = int(getattr(args, "sp", 0) or 0)
    spmd = sp > 1
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes,
        channels=cfg.channels,
        radii=cfg.radii,
        head_dims=cfg.head_dims,
        dropout_rate=cfg.dropout,
        norm=cfg.norm,
        impl="spatial:space" if spmd else cfg.impl,
        use_global_context=cfg.global_context,
        context_axes=("space",) if (spmd and cfg.global_context) else (),
        # BatchNorm moments sync over the whole mesh inside shard_map, so
        # --sp --norm batch normalizes identically to unsharded training
        bn_axes=("data", "space") if (spmd and cfg.norm == "batch") else (),
    )

    def forward(variables, batch, rng, train, mutable):
        pts = batch["points"]
        if train:
            rng, rj = jax.random.split(rng)
            pts = augment.jitter(rj, pts, sigma=0.005, clip=0.02)
        out = model.apply(
            variables, pts, batch["features"], batch["mask"],
            train=train, rngs={"dropout": rng}, mutable=mutable,
        )
        logits, mut = out if mutable else (out, None)
        loss, acc = segmentation_loss(logits, batch["label"], batch["mask"])
        return (loss, {"accuracy": acc}), mut

    loss_fn = _wrap_forward(forward, cfg.norm == "batch")

    sample = s3dis.batch_template(cfg)
    init_model = (model.clone(impl=cfg.impl, context_axes=(), bn_axes=())
                  if spmd else model)
    variables = jax.jit(
        lambda r: init_model.init(
            r, sample["points"], sample["features"], sample["mask"], train=False
        )
    )(jax.random.PRNGKey(cfg.seed))
    params = variables["params"]
    if spmd:
        # full SPMD training: mesh = (data x space), whole step in shard_map,
        # sums-contract loss; eval/checkpoint/resume/dropout/BatchNorm all
        # first-class (BN stats pmean over the mesh via bn_axes above).
        from pointwise_tpu.parallel import make_mesh
        from pointwise_tpu.parallel.spmd import seg_spmd_loss_fn

        mesh = make_mesh(space=sp)
        print(f"# spmd mesh data:{mesh.shape['data']} x "
              f"space:{mesh.shape['space']}", flush=True)
        trainer = Trainer(
            seg_spmd_loss_fn(model, jitter_sigma=0.005,
                             stateful=cfg.norm == "batch"),
            params, cfg.optimizer, mesh=mesh, space_axis="space",
            model_state=variables.get("batch_stats"),
        )
    else:
        trainer = Trainer(loss_fn, params, cfg.optimizer, mesh=_mesh(args),
                          model_state=variables.get("batch_stats"))
    writer = SummaryWriter(args.tensorboard)

    steps_per_epoch = max(1, len(blocks["points"]) // cfg.batch_size)
    return run_train_loop(
        trainer, cfg, args,
        make_epoch_iter=lambda epoch: s3dis.block_batches(
            blocks, cfg.batch_size, seed=cfg.seed + epoch
        ),
        steps_per_epoch=steps_per_epoch,
        max_steps=args.steps or cfg.epochs * steps_per_epoch,
        # remainder kept single-device (a small heldout room must not lose
        # blocks — or worse, yield ZERO batches, which evaluate() now
        # rejects loudly); mesh runs need divisible batches
        eval_iter=lambda: pipeline.prefetch_to_device(
            s3dis.block_batches(eval_blocks, cfg.batch_size, shuffle=False,
                                drop_remainder=bool(args.dp or args.sp)),
            sharding=lambda: getattr(trainer, "batch_sharding", None),
        ),
        eval_split="heldout_rooms" if len(rooms) >= 2 else "heldout_blocks",
        writer=writer,
    )


def train_shapenetpart(cfg: SegmentationConfig, args):
    from pointwise_tpu.data import shapenetpart
    from pointwise_tpu.models import ShapeNetPartSegmenter

    data = shapenetpart.load_shapenetpart(
        cfg.data_dir or args.data_dir, "train", cfg.num_points, seed=cfg.seed,
        variant=cfg.variant,
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

    def forward(variables, batch, rng, train, mutable):
        out = model.apply(
            variables, batch["points"], batch["category"],
            mask=batch["mask"], train=train, rngs={"dropout": rng},
            mutable=mutable,
        )
        logits, mut = out if mutable else (out, None)
        loss, acc = segmentation_loss(logits, batch["label"], batch["mask"])
        return (loss, {"accuracy": acc}), mut

    loss_fn = _wrap_forward(forward, cfg.norm == "batch")
    sample = {
        "points": jnp.zeros((cfg.batch_size, cfg.num_points, 3)),
        "category": jnp.zeros((cfg.batch_size,), jnp.int32),
        "mask": jnp.ones((cfg.batch_size, cfg.num_points)),
    }
    variables = jax.jit(
        lambda r: model.init(
            r, sample["points"], sample["category"], mask=sample["mask"],
            train=False,
        )
    )(jax.random.PRNGKey(cfg.seed))
    trainer = Trainer(loss_fn, variables["params"], cfg.optimizer,
                      mesh=_mesh(args),
                      model_state=variables.get("batch_stats"))

    steps_per_epoch = max(1, len(data.category) // cfg.batch_size)
    return run_train_loop(
        trainer, cfg, args,
        make_epoch_iter=lambda epoch: shapenetpart.batches(
            data, cfg.batch_size, seed=cfg.seed + epoch
        ),
        steps_per_epoch=steps_per_epoch,
        max_steps=args.steps or cfg.epochs * steps_per_epoch,
        writer=SummaryWriter(args.tensorboard),
    )


def _mesh(args):
    """Data-parallel mesh over all local devices when --dp is set."""
    if not getattr(args, "dp", False):
        return None
    from pointwise_tpu.parallel import make_mesh

    mesh = make_mesh()
    print(f"# data-parallel over {mesh.shape['data']} devices", flush=True)
    return mesh


def main():
    from pointwise_tpu.parallel import init_distributed
    from pointwise_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    if init_distributed():   # multi-host pods; no-op without a coordinator
        print(f"# distributed: process {jax.process_index()}"
              f"/{jax.process_count()}", flush=True)
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
    ap.add_argument("--norm", default=None, choices=["layer", "batch", "none"],
                    help="override the config's normalization (norm='batch' "
                         "threads BatchNorm batch_stats through the trainer, "
                         "matching the reference's TF-1 BN training)")
    ap.add_argument("--seed", type=int, default=None,
                    help="override the config seed (init + data + rng "
                         "stream; seed sweeps for anchor variance)")
    args = ap.parse_args()

    cfg = get_config(args.config)
    if args.norm:
        cfg = dataclasses.replace(cfg, norm=args.norm)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.checkpoint_dir:
        cfg = dataclasses.replace(cfg, checkpoint_dir=args.checkpoint_dir)
    print(f"# config={args.config} backend={jax.default_backend()} "
          f"devices={len(jax.devices())}", flush=True)
    if isinstance(cfg, ClassificationConfig):
        train_classification(cfg, args)
    elif cfg.name.startswith("shapenetpart"):
        train_shapenetpart(cfg, args)
    else:
        train_segmentation(cfg, args)


if __name__ == "__main__":
    main()
