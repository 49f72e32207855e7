#!/usr/bin/env python
"""Evaluation / inference CLI (rebuild of the reference's test_*.py scripts,
SURVEY.md C11).

  python eval.py --config modelnet40_synthetic --checkpoint-dir ckpt/
      classification accuracy; --votes R adds rotation voting (average
      logits over R rotations about the up axis, the reference eval trick).

  python eval.py --config s3dis_synthetic --checkpoint-dir ckpt/
      full-scene segmentation: sliding blocks + overlap voting -> per-point
      labels -> accuracy / mIoU (SURVEY.md section 3.3 flow).
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.data import modelnet, s3dis, scenenn
from pointwise_tpu.models import PointwiseClassifier, PointwiseSegmenter
from pointwise_tpu.train import get_config
from pointwise_tpu.train.configs import ClassificationConfig, SegmentationConfig
from pointwise_tpu.train.trainer import Trainer


def _restore_variables(cfg, model, sample_args, checkpoint_dir):
    """Init + (optionally) restore the model's variables.

    Returns the full apply-able variables dict — {'params': ...} plus
    'batch_stats' for norm='batch' models, so BN checkpoints evaluate with
    their trained running moments (the restore template must carry
    model_state or the Trainer's structural fallback drops it).
    """
    variables = jax.jit(
        lambda r: model.init(r, *sample_args, train=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    model_state = variables.get("batch_stats")
    if checkpoint_dir:
        trainer = Trainer(lambda p, b, r, t: (jnp.zeros(()), {}), params,
                          cfg.optimizer, donate=False,
                          model_state=model_state)
        step = trainer.restore_checkpoint(checkpoint_dir)
        print(f"# restored step {step} from {checkpoint_dir}", flush=True)
        out = {"params": trainer.state.params}
        if trainer.state.model_state is not None:
            out["batch_stats"] = trainer.state.model_state
        return out
    print("# no checkpoint dir: evaluating fresh params", flush=True)
    return {"params": params} if model_state is None else {
        "params": params, "batch_stats": model_state}


def _pad_batch(batch: dict, batch_size: int):
    """Pad a final partial batch to the jitted batch size by repeating the
    last row (full-test-set protocol: no sample is dropped); returns
    (padded batch, true size)."""
    n = len(next(iter(batch.values())))
    if n == batch_size:
        return batch, n
    reps = batch_size - n
    return {
        k: np.concatenate([v, np.repeat(v[-1:], reps, axis=0)])
        for k, v in batch.items()
    }, n


def eval_classification(cfg: ClassificationConfig, args):
    data = modelnet.load_modelnet40(
        cfg.data_dir or args.data_dir, "test", cfg.num_points,
        synthetic_size=256, seed=cfg.seed, variant=cfg.variant,
    )
    if data.num_classes > cfg.num_classes:
        # more classes in the data than the config: the head must widen
        cfg = dataclasses.replace(cfg, num_classes=data.num_classes)
    elif data.num_classes < cfg.num_classes:
        # keep the CONFIG's head width: the checkpoint was trained with it,
        # and a test split missing the top class id must not shrink the head
        # (restore-shape mismatch / misaligned logits otherwise).
        print(f"# note: data has {data.num_classes} classes; keeping the "
              f"config's {cfg.num_classes}-way head", flush=True)
    model = PointwiseClassifier(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout, norm=cfg.norm,
        impl=cfg.impl,
    )
    sample = jnp.zeros((cfg.batch_size, cfg.num_points, 3))
    variables = _restore_variables(cfg, model, (sample,), args.checkpoint_dir)

    @jax.jit
    def logits_fn(variables, pts):
        return model.apply(variables, pts, train=False)

    votes = max(1, args.votes)
    correct = total = 0
    preds, labs = [], []
    for batch in modelnet.batches(data, cfg.batch_size, shuffle=False,
                                  drop_remainder=False):
        batch, nb = _pad_batch(batch, cfg.batch_size)
        pts = jnp.asarray(batch["points"])
        acc_logits = 0.0
        for v in range(votes):
            theta = 2 * np.pi * v / votes
            c, s = np.cos(theta), np.sin(theta)
            rot = jnp.asarray(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], jnp.float32
            )
            acc_logits = acc_logits + logits_fn(variables, pts @ rot)
        pred = np.asarray(jnp.argmax(acc_logits, -1))[:nb]
        lab = batch["label"][:nb]
        preds.append(pred)
        labs.append(lab)
        correct += int((pred == lab).sum())
        total += len(pred)
    acc = correct / max(total, 1)
    # mean class accuracy, the second number the reference's eval reports
    pred = np.concatenate(preds)
    lab = np.concatenate(labs)
    from pointwise_tpu.utils.metrics import segmentation_metrics

    mca = segmentation_metrics(pred, lab, cfg.num_classes)["mean_class_accuracy"]
    print(json.dumps({"metric": "classification_accuracy", "value": acc,
                      "mean_class_accuracy": round(mca, 6),
                      "votes": votes, "n": total}), flush=True)
    return acc


def eval_segmentation_streaming(cfg: SegmentationConfig, args, scenes,
                                feature_mode):
    """Exact full-scene eval via overlap-save streaming (no block voting).

    Uses a locality-only net (no global context) and halo = sum of radii;
    per-point logits equal the full-scene forward exactly, so this is the
    bias-free counterpart of the reference's approximate overlap voting.
    """
    import functools

    import numpy as np

    from pointwise_tpu.streaming import stream_apply_layered

    if cfg.global_context:
        # a global-context checkpoint's head consumes the pooled features
        # (extra 2C columns) — restoring it into the locality-only
        # streaming net fails with an opaque shape error; fail with the fix
        raise SystemExit(
            f"--streaming needs a locality-only net, but config "
            f"{cfg.name!r} trains with global_context=True (its head "
            f"shapes include the pooled features).  Train/evaluate a "
            f"*_local variant instead (e.g. s3dis_synthetic_local, "
            f"scenenn_local), or use block voting for this checkpoint.")
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout, norm=cfg.norm,
        impl=cfg.impl, use_global_context=False,
    )
    tmpl = s3dis.batch_template(cfg)
    variables = _restore_variables(
        cfg, model, (tmpl["points"], tmpl["features"], tmpl["mask"]),
        args.checkpoint_dir,
    )

    # variables as an argument: weight-independent HLO -> the persistent
    # compile cache hits across processes/checkpoints (see infer.py)
    @functools.partial(jax.jit, static_argnums=(6,))
    def apply_layered_p(v, pts, fts, cnt, sels, skips, lengths):
        return model.apply(v, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return apply_layered_p(variables, pts, fts, cnt, sels, skips, lengths)

    halo = float(sum(cfg.radii))
    all_pred, all_lab = [], []
    for i, (xyz, rgb, lab) in enumerate(scenes):
        if feature_mode == "rgb":
            feats = rgb
        else:
            mins = xyz.min(0)
            span = np.maximum(xyz.max(0) - mins, 1e-6)
            feats = np.concatenate([rgb, (xyz - mins) / span], axis=1)
        logits = stream_apply_layered(
            apply_layered, xyz, feats, radii=cfg.radii,
            tile_size=max(2.0 * halo, cfg.block_size),
            out_dim=cfg.num_classes,
        )
        pred = logits.argmax(axis=1).astype(np.int32)
        m = s3dis.iou_metrics(pred, lab, cfg.num_classes)
        print(f"# scene {i} (streaming): acc={m['accuracy']:.4f} "
              f"miou={m['miou']:.4f}", flush=True)
        all_pred.append(pred)
        all_lab.append(lab)
    m = s3dis.iou_metrics(
        np.concatenate(all_pred), np.concatenate(all_lab), cfg.num_classes
    )
    print(json.dumps({"metric": "segmentation_streaming",
                      "accuracy": m["accuracy"], "miou": m["miou"],
                      "scenes": len(scenes)}), flush=True)
    return m


def eval_segmentation(cfg: SegmentationConfig, args):
    if cfg.name.startswith("scenenn"):
        scenes = scenenn.load_scenes(cfg.data_dir or args.data_dir, seed=cfg.seed)
        feature_mode = "rgb"
    else:
        scenes = s3dis.load_rooms(cfg.data_dir or args.data_dir, seed=cfg.seed)
        feature_mode = "rgb" if cfg.in_features == 3 else "rgb_norm"
    if args.streaming:
        return eval_segmentation_streaming(cfg, args, scenes, feature_mode)
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout, norm=cfg.norm,
        impl=cfg.impl, use_global_context=cfg.global_context,
    )
    tmpl = s3dis.batch_template(cfg)
    variables = _restore_variables(
        cfg, model, (tmpl["points"], tmpl["features"], tmpl["mask"]),
        args.checkpoint_dir,
    )

    @jax.jit
    def logits_fn(variables, pts, feats, mask):
        return model.apply(variables, pts, feats, mask, train=False)

    def predict(points, features, mask):
        return np.asarray(
            logits_fn(variables, jnp.asarray(points), jnp.asarray(features),
                      jnp.asarray(mask))
        )

    # voting density: denser than the training stride by default,
    # controllable from the CLI (--stride)
    stride = args.stride if args.stride is not None else cfg.block_stride / 2
    if stride <= 0:
        raise SystemExit(f"--stride must be > 0, got {stride}")
    all_pred, all_lab = [], []
    for i, (xyz, rgb, lab) in enumerate(scenes):
        res = s3dis.predict_scene_voting(
            predict, xyz, rgb,
            num_classes=cfg.num_classes, num_points=cfg.num_points,
            block_size=cfg.block_size, stride=stride,
            batch_size=cfg.batch_size, label=lab, feature_mode=feature_mode,
        )
        m = s3dis.iou_metrics(res["pred"], lab, cfg.num_classes)
        print(f"# scene {i}: acc={m['accuracy']:.4f} miou={m['miou']:.4f} "
              f"covered={res['covered'].mean():.3f}", flush=True)
        all_pred.append(res["pred"])
        all_lab.append(lab)
    m = s3dis.iou_metrics(
        np.concatenate(all_pred), np.concatenate(all_lab), cfg.num_classes
    )
    print(json.dumps({"metric": "segmentation", "accuracy": m["accuracy"],
                      "miou": m["miou"], "scenes": len(scenes)}), flush=True)
    return m


def eval_shapenetpart(cfg: SegmentationConfig, args):
    from pointwise_tpu.data import shapenetpart
    from pointwise_tpu.models import ShapeNetPartSegmenter

    data = shapenetpart.load_shapenetpart(
        cfg.data_dir or args.data_dir, "test", cfg.num_points,
        synthetic_size=64, seed=cfg.seed, variant=cfg.variant,
    )
    model = ShapeNetPartSegmenter(
        num_parts=data.num_parts, num_categories=data.num_categories,
        channels=cfg.channels, radii=cfg.radii, head_dims=cfg.head_dims,
        dropout_rate=cfg.dropout, norm=cfg.norm, impl=cfg.impl,
    )
    sample = (
        jnp.zeros((cfg.batch_size, cfg.num_points, 3)),
        jnp.zeros((cfg.batch_size,), jnp.int32),
    )
    variables = _restore_variables(cfg, model, sample, args.checkpoint_dir)

    @jax.jit
    def logits_fn(variables, pts, cat):
        return model.apply(variables, pts, cat, train=False)

    preds, labs, cats = [], [], []
    for batch in shapenetpart.batches(data, cfg.batch_size, shuffle=False,
                                      drop_remainder=False):
        batch, nb = _pad_batch(batch, cfg.batch_size)
        lg = logits_fn(variables, jnp.asarray(batch["points"]),
                       jnp.asarray(batch["category"]))
        preds.append(np.asarray(jnp.argmax(lg, -1))[:nb])
        labs.append(batch["label"][:nb])
        cats.append(batch["category"][:nb])
    pred = np.concatenate(preds)
    lab = np.concatenate(labs)
    cat = np.concatenate(cats)
    acc = float((pred == lab).mean())
    # convention-correct instance mIoU: each shape averaged over its
    # category's FULL part set (the dataset carries the mapping)
    miou = shapenetpart.category_miou(
        pred, lab, cat, parts_per_category=data.parts_per_category)
    print(json.dumps({"metric": "shapenetpart", "accuracy": acc,
                      "instance_miou": miou, "n": len(cat)}), flush=True)
    return miou


def main():
    from pointwise_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="modelnet40_synthetic")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--votes", type=int, default=1,
                    help="rotation votes for classification eval")
    ap.add_argument("--stride", type=float, default=None,
                    help="segmentation voting stride (default: half the "
                         "config's block_stride)")
    ap.add_argument("--streaming", action="store_true",
                    help="segmentation: exact overlap-save streaming instead"
                         " of block voting (needs a locality-only net)")
    ap.add_argument("--norm", default=None, choices=["layer", "batch", "none"],
                    help="override the config's normalization — must match "
                         "the checkpoint's training flag (train.py --norm)")
    args = ap.parse_args()
    cfg = get_config(args.config)
    if args.norm:
        cfg = dataclasses.replace(cfg, norm=args.norm)
    print(f"# eval config={args.config} backend={jax.default_backend()}", flush=True)
    if isinstance(cfg, ClassificationConfig):
        eval_classification(cfg, args)
    elif cfg.name.startswith("shapenetpart"):
        eval_shapenetpart(cfg, args)
    else:
        eval_segmentation(cfg, args)


if __name__ == "__main__":
    main()
