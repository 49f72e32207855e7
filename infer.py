#!/usr/bin/env python
"""Large-scan streaming inference CLI (BASELINE.json config 5).

Runs a segmentation net over an arbitrarily large scene with exact
overlap-save tiling (pointwise_tpu/streaming.py): native grid-hash tile
partition, halo = receptive field, bucketed static shapes.

  python infer.py --config s3dis_synthetic --points 1000000
  python infer.py --config s3dis --data-dir <rooms/> --checkpoint-dir ckpt/
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.data import s3dis, synthetic
from pointwise_tpu.models import PointwiseSegmenter
from pointwise_tpu.streaming import stream_apply, stream_apply_layered
from pointwise_tpu.train import get_config


def big_scene(n_points: int, seed: int = 0, num_classes: int = 5):
    """Procedural scene scaled to ~n_points (room area grows with N to keep
    realistic density)."""
    per_obj = 4096
    num_obj = max(2, int(n_points / (per_obj * 1.5)))
    room = max(4.0, float(np.sqrt(num_obj)) * 1.2)
    return synthetic.segmentation_scene(
        seed, num_objects=num_obj, points_per_obj=per_obj, room=room,
        num_classes=num_classes,
    )


def main():
    from pointwise_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="s3dis_synthetic")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--points", type=int, default=1_000_000,
                    help="synthetic scene size when no data dir given")
    # round-3 sweep (GOLDEN.md): with halo 1.5, bigger tiles amortize the
    # halo overlap — 4.0 m measured 76.9K pts/s steady vs 58.1K at 2.0 m
    ap.add_argument("--tile-size", type=float, default=4.0)
    ap.add_argument("--tile-batch", type=int, default=4)
    ap.add_argument("--layered", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="layer-wise shrinking halos (exact; faster)")
    ap.add_argument("--save-ply", default=None,
                    help="write class-colored predictions as binary PLY "
                         "(any standard viewer opens it)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="stream the scene N times and report each pass; "
                         "passes beyond the first amortize compiles and "
                         "program loads — the keep-alive SERVING number")
    ap.add_argument("--dp", action="store_true",
                    help="shard tile batches over all local devices")
    args = ap.parse_args()
    cfg = get_config(args.config)

    if args.data_dir:
        xyz, rgb, lab = s3dis.load_rooms(args.data_dir)[0]
    else:
        t0 = time.time()
        xyz, rgb, lab = big_scene(args.points, num_classes=cfg.num_classes)
        print(f"# scene: {len(xyz)} pts in {time.time()-t0:.1f}s", flush=True)

    # features must match training: rgb (+ scene-normalized coords)
    if cfg.in_features == 3:
        feats = rgb
    else:
        mins = xyz.min(0)
        span = np.maximum(xyz.max(0) - mins, 1e-6)
        feats = np.concatenate([rgb, (xyz - mins) / span], axis=1)

    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout, norm=cfg.norm,
        impl=cfg.impl, use_global_context=False,   # locality => exact streaming
    )
    tmpl = s3dis.batch_template(cfg)
    params = jax.jit(
        lambda r: model.init(r, tmpl["points"], tmpl["features"],
                             tmpl["mask"], train=False)
    )(jax.random.PRNGKey(0))["params"]
    if args.checkpoint_dir:
        from pointwise_tpu.train.trainer import Trainer

        tr = Trainer(lambda p, b, r, t: (jnp.zeros(()), {}), params,
                     cfg.optimizer, donate=False)
        step = tr.restore_checkpoint(args.checkpoint_dir)
        params = tr.state.params
        print(f"# restored step {step}", flush=True)

    halo = float(sum(cfg.radii))
    t0 = time.time()
    prog = lambda d, t, b: print(  # noqa: E731
        f"# tiles {d}/{t} (bucket {b}) {time.time()-t0:.1f}s", flush=True
    ) if d % 64 == 0 or d == t else None
    if args.layered:
        # layer-wise shrinking halos: layer l only convolves where the
        # remaining receptive field needs it (exact; see streaming.py)
        import functools

        # params travel as an ARGUMENT (not a closure constant): the jitted
        # HLO is then weight-independent, so the persistent compile cache
        # hits across processes and across checkpoints (closure params bake
        # the weights into the program as constants and defeat it).
        @functools.partial(jax.jit, static_argnums=(6,))
        def apply_layered_p(p, pts, fts, cnt, sels, skips, lengths):
            return model.apply({"params": p}, pts, fts, cnt, sels, skips,
                               lengths=lengths, method="streaming_logits")

        def apply_layered(pts, fts, cnt, sels, skips, lengths):
            return apply_layered_p(params, pts, fts, cnt, sels, skips, lengths)

        mesh = None
        if args.dp:
            from pointwise_tpu.parallel import make_mesh

            mesh = make_mesh()
            print(f"# tile batches sharded over {mesh.shape['data']} devices",
                  flush=True)
        for rep in range(max(1, args.repeat)):
            t0 = time.time()
            logits = stream_apply_layered(
                apply_layered, xyz, feats,
                radii=cfg.radii, tile_size=args.tile_size,
                out_dim=cfg.num_classes, tile_batch=args.tile_batch,
                progress=prog if rep == 0 else None, mesh=mesh,
            )
            dt_rep = time.time() - t0
            if args.repeat > 1:
                print(f"# pass {rep}: {dt_rep:.2f}s -> "
                      f"{len(xyz)/dt_rep:.0f} pts/s", flush=True)
    else:
        @jax.jit
        def apply_p(p, pts, fts, mask):
            return model.apply({"params": p}, pts, fts, mask, train=False)

        def apply_fn(pts, fts, mask):
            return apply_p(params, pts, fts, mask)

        for rep in range(max(1, args.repeat)):
            t0 = time.time()
            logits = stream_apply(
                apply_fn, xyz, feats,
                halo=halo, tile_size=args.tile_size, out_dim=cfg.num_classes,
                tile_batch=args.tile_batch,
                progress=prog if rep == 0 else None,
            )
            dt_rep = time.time() - t0
            if args.repeat > 1:
                print(f"# pass {rep}: {dt_rep:.2f}s -> "
                      f"{len(xyz)/dt_rep:.0f} pts/s", flush=True)
    dt = time.time() - t0   # with --repeat > 1: the LAST pass (serving rate)
    pred = logits.argmax(axis=1).astype(np.int32)
    if args.save_ply:
        from pointwise_tpu.utils.ply import write_ply

        write_ply(args.save_ply, xyz, labels=pred)
        print(f"# wrote {args.save_ply} ({len(xyz)} pts, class-colored)",
              flush=True)
    rec = {
        "metric": "streaming_points_per_sec",
        "value": round(len(xyz) / dt),
        "unit": "points/s",
        "n_points": len(xyz),
        "seconds": round(dt, 2),
        "halo": halo,
        "layered": bool(args.layered),
    }
    if args.repeat > 1:
        rec["passes"] = args.repeat   # value/seconds describe the last pass
    if lab is not None and not args.data_dir:
        m = s3dis.iou_metrics(pred, lab, cfg.num_classes)
        rec["accuracy"] = round(m["accuracy"], 4)
        rec["miou"] = round(m["miou"], 4)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
