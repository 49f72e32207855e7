#!/usr/bin/env python
"""Attribute the streaming steady state at large scene sizes.

VERDICT r4 task 2: the per-point rate nearly halves from the 200K bench
scene (~140K pts/s) to the 1M GOLDEN scene (~79K pts/s) and nobody
measured where the extra time goes.  This script runs the layered engine
on one scene size (default 1M) in-process:

  pass 0  warm (compiles / program loads)
  pass 1  steady, engine phase timers only (events dict)
  pass 2  steady, plus a jax.profiler trace -> DEVICE-plane module total

and prints the decomposition: schedule build, packer busy time, dispatch
thread (stage+apply call time), flush fetch (device barrier) vs scatter,
wait-on-packer, and the device-plane compute total, so host-bound vs
device-bound vs padding-bound is measured, not guessed.

    python scripts/attribute_streaming.py --points 1000000
    python scripts/attribute_streaming.py --points 200000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_module_total(logdir: str) -> float:
    """Whole-trace device jit time — the shared library accounting
    (utils.runtime.device_jit_seconds; one copy of the module-line rule)."""
    from pointwise_tpu.utils.runtime import device_jit_seconds

    return device_jit_seconds(logdir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--tile-size", type=float, default=4.0)
    ap.add_argument("--tile-batch", type=int, default=4)
    ap.add_argument("--config", default="s3dis_synthetic")
    ap.add_argument("--logdir", default="/tmp/pw_attr_stream")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import functools

    import jax

    from pointwise_tpu.data import s3dis
    from pointwise_tpu.models import PointwiseSegmenter
    from pointwise_tpu.streaming import stream_apply_layered
    from pointwise_tpu.train import get_config
    from pointwise_tpu.utils.runtime import enable_compile_cache

    import infer as infer_cli

    enable_compile_cache()
    cfg = get_config(args.config)
    xyz, rgb, _ = infer_cli.big_scene(args.points, num_classes=cfg.num_classes)
    feats = infer_cli.scene_features(cfg, xyz, rgb)
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout, norm=cfg.norm,
        impl=cfg.impl, use_global_context=False,
    )
    tmpl = s3dis.batch_template(cfg)
    params = jax.jit(
        lambda r: model.init(r, tmpl["points"], tmpl["features"],
                             tmpl["mask"], train=False)
    )(jax.random.PRNGKey(0))["params"]

    @functools.partial(jax.jit, static_argnums=(6,))
    def apply_p(p, pts, fts, cnt, sels, skips, lengths):
        return model.apply({"params": p}, pts, fts, cnt, sels, skips,
                           lengths=lengths, method="streaming_logits")

    def apply_fn(pts, fts, cnt, sels, skips, lengths):
        return apply_p(params, pts, fts, cnt, sels, skips, lengths)

    def one_pass(tag, trace=False):
        ev = {}
        if trace:
            shutil.rmtree(args.logdir, ignore_errors=True)
            jax.profiler.start_trace(args.logdir)
        t0 = time.perf_counter()
        try:
            stream_apply_layered(
                apply_fn, xyz, feats, radii=cfg.radii,
                tile_size=args.tile_size, out_dim=cfg.num_classes,
                tile_batch=args.tile_batch, events=ev)
        finally:
            if trace:
                jax.profiler.stop_trace()
        wall = time.perf_counter() - t0
        rec = {"pass": tag, "n_points": len(xyz), "wall_s": round(wall, 3),
               "pts_per_s": round(len(xyz) / wall)}
        rec.update(ev)
        if trace:
            rec["device_jit_s"] = round(device_module_total(args.logdir), 3)
        print(json.dumps(rec), flush=True)
        return rec

    one_pass("warm")
    one_pass("steady")
    if not args.no_trace:
        one_pass("steady_traced", trace=True)


if __name__ == "__main__":
    main()
