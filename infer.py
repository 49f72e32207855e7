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


def scene_features(cfg, xyz, rgb):
    """Training-convention input features: rgb (+ scene-normalized coords)."""
    if cfg.in_features == 3:
        return rgb
    mins = xyz.min(0)
    span = np.maximum(xyz.max(0) - mins, 1e-6)
    return np.concatenate([rgb, (xyz - mins) / span], axis=1)


def load_scene_file(path):
    """One room/scene file on the s3dis on-disk contract: .npy (N, >=6) =
    xyz, rgb [, label].  Returns (xyz f32, rgb f32 in [0,1], label|None)."""
    from pointwise_tpu.utils.spatial import check_coordinates

    arr = np.load(path)
    if arr.ndim != 2 or arr.shape[1] < 6:
        raise ValueError(f"{path}: expected (N, >=6) array, got {arr.shape}")
    xyz = check_coordinates(arr[:, 0:3].astype(np.float32), name=path)
    rgb = arr[:, 3:6].astype(np.float32)
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    lab = arr[:, 6].astype(np.int32) if arr.shape[1] > 6 else None
    return xyz, rgb, lab


def load_profiles(path):
    """Length-profile persistence (JSON {key: [tbs, [lengths...]]}).

    Keys are either a p0 bucket (int, small-tile groups) or a full padded
    schedule (tuple of ints, big-tile tbs==1 groups — see the round-5
    per-schedule grouping in streaming.py); tuples serialize as
    comma-joined strings."""
    import os

    if not path or not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)

    def key(b):
        return (tuple(int(x) for x in b.split(","))
                if "," in b else int(b))

    return {key(b): (int(v[0]), tuple(int(x) for x in v[1]))
            for b, v in raw.items()}


def save_profiles(path, profiles):
    if not path:
        return

    def key(b):
        return ",".join(str(x) for x in b) if isinstance(b, tuple) else str(b)

    with open(path, "w") as f:
        json.dump({key(b): [v[0], list(v[1])] for b, v in profiles.items()},
                  f)


def serve(args, cfg, model, variables):
    """Keep-alive serving loop (VERDICT r3 task 1): programs compile/load
    ONCE (on a synthetic warm-up scene), then every request streams at the
    engine's steady-state rate — the fresh-process executable-load penalty
    (47-68 s good hours, 3-5x worse through a degraded tunnel) is paid once
    per process instead of once per scene.

    Protocol (stdin -> stdout JSONL): one request per line —
      ``<path>.npy``            infer the scene file, write <path>.pred.npy
      ``synth:<n>``             procedural n-point scene (measurement)
      ``quit``                  exit
    Each reply line: {"scene", "n_points", "seconds", "pts_per_s", ...}.

    Program reuse across requests: a shared length-profile dict (see
    stream_apply_layered) keeps bucket-group schedules scene-independent
    once warmed, so a new scene size does NOT stall on a fresh 20-60 s
    program compile (measured: an unwarmed novel bucket schedule cost 125 s
    mid-serve before profiles).  ``--profile-file`` persists the profile so
    a RESTARTED server replays identical programs -> persistent compile
    cache hits instead of recompiles.
    """
    import functools
    import sys as _sys

    profiles = load_profiles(args.profile_file)

    @functools.partial(jax.jit, static_argnums=(6,))
    def apply_layered_p(v, pts, fts, cnt, sels, skips, lengths):
        return model.apply(v, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    def apply_layered(pts, fts, cnt, sels, skips, lengths):
        return apply_layered_p(variables, pts, fts, cnt, sels, skips, lengths)

    # same mesh wiring as the one-shot path: tile batches over 'data'
    # (--dp), resident scene rows over 'space' (--sp) — a serving host with
    # several chips must not silently run single-device
    mesh = None
    scene_axis = None
    if args.dp or args.sp > 1:
        from pointwise_tpu.parallel import make_mesh

        mesh = make_mesh(space=args.sp)
        print(f"# tile batches over data:{mesh.shape['data']}"
              + (f", scene rows over space:{args.sp}"
                 if args.sp > 1 else ""), flush=True)
        scene_axis = "space" if args.sp > 1 else None

    def run(xyz, feats):
        # per-request compile visibility (VERDICT r4 task 9): the engine
        # reports whether THIS request had to build new programs (a
        # profile-covered request reports compiled: False)
        ev = {}
        out = stream_apply_layered(
            apply_layered, xyz, feats, radii=cfg.radii,
            tile_size=args.tile_size, out_dim=cfg.num_classes,
            tile_batch=args.tile_batch, length_profiles=profiles,
            mesh=mesh, scene_axis=scene_axis, events=ev,
        )
        save_profiles(args.profile_file, profiles)
        return out, ev

    if args.warm_points > 0:
        t0 = time.time()
        xyz, rgb, _ = big_scene(args.warm_points, num_classes=cfg.num_classes)
        run(xyz, scene_features(cfg, xyz, rgb))
        print(json.dumps({"ready": True,
                          "warmup_s": round(time.time() - t0, 2),
                          "warm_points": args.warm_points}), flush=True)
    else:
        print(json.dumps({"ready": True}), flush=True)

    for line in _sys.stdin:
        req = line.strip()
        if not req or req.startswith("#"):
            continue
        if req == "quit":
            break
        try:
            t0 = time.time()
            if req.startswith("synth:"):
                xyz, rgb, lab = big_scene(int(req.split(":", 1)[1]),
                                          num_classes=cfg.num_classes)
                out_path = None
            else:
                xyz, rgb, lab = load_scene_file(req)
                out_path = req[: -len(".npy")] + ".pred.npy" \
                    if req.endswith(".npy") else req + ".pred.npy"
            t_load = time.time() - t0
            t0 = time.time()
            logits, ev = run(xyz, scene_features(cfg, xyz, rgb))
            dt = time.time() - t0
            pred = logits.argmax(axis=1).astype(np.int32)
            rec = {"scene": req, "n_points": len(xyz),
                   "seconds": round(dt, 3),
                   "pts_per_s": round(len(xyz) / dt),
                   "load_s": round(t_load, 3),
                   "compiled": bool(ev.get("compiled", False)),
                   "new_programs": int(ev.get("new_programs", 0)),
                   "compile_s": round(float(ev.get("warm_s", 0.0)), 2)}
            if out_path:
                np.save(out_path, pred)
                rec["output"] = out_path
            if lab is not None:
                m = s3dis.iou_metrics(pred, lab, cfg.num_classes)
                rec["accuracy"] = round(m["accuracy"], 4)
                rec["miou"] = round(m["miou"], 4)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # keep serving on bad requests
            print(json.dumps({"scene": req, "error": repr(e)[:200]}),
                  flush=True)


def main():
    from pointwise_tpu.parallel import init_distributed
    from pointwise_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    if init_distributed():   # multi-host pods; no-op without a coordinator
        print(f"# distributed: process {jax.process_index()}"
              f"/{jax.process_count()}", flush=True)
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
    ap.add_argument("--serve", action="store_true",
                    help="keep-alive serving loop: warm once, then stream "
                         "scenes from stdin requests (see serve())")
    ap.add_argument("--warm-points", type=int, default=200_000,
                    help="--serve warm-up scene size (0 disables)")
    ap.add_argument("--profile-file", default=None,
                    help="persist streaming length profiles (JSON): a "
                         "restarted process replays the same programs, so "
                         "the persistent compile cache hits")
    ap.add_argument("--dp", action="store_true",
                    help="shard tile batches over all local devices")
    ap.add_argument("--sp", type=int, default=1,
                    help="also row-shard the device-resident scene over a "
                         "'space' mesh axis of this size (scans beyond one "
                         "chip's HBM; composes with --dp)")
    ap.add_argument("--norm", default=None, choices=["layer", "batch", "none"],
                    help="override the config's normalization — must match "
                         "the checkpoint's training flag (train.py --norm)")
    args = ap.parse_args()
    cfg = get_config(args.config)
    if args.norm:
        import dataclasses

        cfg = dataclasses.replace(cfg, norm=args.norm)

    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout, norm=cfg.norm,
        impl=cfg.impl, use_global_context=False,   # locality => exact streaming
    )
    tmpl = s3dis.batch_template(cfg)
    init_vars = jax.jit(
        lambda r: model.init(r, tmpl["points"], tmpl["features"],
                             tmpl["mask"], train=False)
    )(jax.random.PRNGKey(0))
    # full variables dict (+'batch_stats' for norm='batch' checkpoints) —
    # see eval._restore_variables for the restore-template rationale
    variables = {"params": init_vars["params"]}
    if "batch_stats" in init_vars:
        variables["batch_stats"] = init_vars["batch_stats"]
    if args.checkpoint_dir:
        from pointwise_tpu.train.trainer import Trainer

        tr = Trainer(lambda p, b, r, t: (jnp.zeros(()), {}),
                     init_vars["params"], cfg.optimizer, donate=False,
                     model_state=init_vars.get("batch_stats"))
        step = tr.restore_checkpoint(args.checkpoint_dir)
        variables = {"params": tr.state.params}
        if tr.state.model_state is not None:
            variables["batch_stats"] = tr.state.model_state
        print(f"# restored step {step}", flush=True)

    if args.serve:
        if not args.layered:
            raise SystemExit("--serve supports only the layered engine "
                             "(drop --no-layered)")
        return serve(args, cfg, model, variables)

    if args.data_dir:
        xyz, rgb, lab = s3dis.load_rooms(args.data_dir)[0]
    else:
        t0 = time.time()
        xyz, rgb, lab = big_scene(args.points, num_classes=cfg.num_classes)
        print(f"# scene: {len(xyz)} pts in {time.time()-t0:.1f}s", flush=True)
    feats = scene_features(cfg, xyz, rgb)

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
        def apply_layered_p(v, pts, fts, cnt, sels, skips, lengths):
            return model.apply(v, pts, fts, cnt, sels, skips,
                               lengths=lengths, method="streaming_logits")

        def apply_layered(pts, fts, cnt, sels, skips, lengths):
            return apply_layered_p(variables, pts, fts, cnt, sels, skips,
                                   lengths)

        mesh = None
        scene_axis = None
        if args.dp or args.sp > 1:
            from pointwise_tpu.parallel import make_mesh

            mesh = make_mesh(space=args.sp)
            print(f"# tile batches over data:{mesh.shape['data']}"
                  + (f", scene rows over space:{args.sp}"
                     if args.sp > 1 else ""), flush=True)
            scene_axis = "space" if args.sp > 1 else None
        profiles = load_profiles(args.profile_file)
        for rep in range(max(1, args.repeat)):
            t0 = time.time()
            ev = {}
            logits = stream_apply_layered(
                apply_layered, xyz, feats,
                radii=cfg.radii, tile_size=args.tile_size,
                out_dim=cfg.num_classes, tile_batch=args.tile_batch,
                progress=prog if rep == 0 else None, mesh=mesh,
                scene_axis=scene_axis, length_profiles=profiles,
                events=ev,
            )
            dt_rep = time.time() - t0
            if rep == 0:
                save_profiles(args.profile_file, profiles)
            if args.repeat > 1:
                print(f"# pass {rep}: {dt_rep:.2f}s -> "
                      f"{len(xyz)/dt_rep:.0f} pts/s, compiled="
                      f"{bool(ev.get('compiled'))}"
                      f" ({ev.get('new_programs', 0)} programs,"
                      f" {ev.get('warm_s', 0.0):.1f}s warm)", flush=True)
    else:
        @jax.jit
        def apply_p(v, pts, fts, mask):
            return model.apply(v, pts, fts, mask, train=False)

        def apply_fn(pts, fts, mask):
            return apply_p(variables, pts, fts, mask)

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
