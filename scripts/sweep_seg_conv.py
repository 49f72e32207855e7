#!/usr/bin/env python
"""Device-plane sweep of the conv kernels at the SEGMENTATION shapes.

VERDICT r4 task 1: the S3DIS train step (B=8, N=4096, 4 conv layers, radii
0.1/0.2/0.4/0.8 on ~1 m sliding blocks) had no per-kernel attribution.
This script times fwd / dW / dX for each layer's (radius, cin, cout) on
REAL morton-sorted block geometry (s3dis.training_blocks), across the
dispatch levers exposed by the op (csr auto/on/off, tile_m), on the
DEVICE plane (utils.runtime.profile_device_time — dispatch-immune).

    python scripts/sweep_seg_conv.py [--quick]

Prints one table row per (layer, variant): device ms and pts/s, so the
CSR-vs-dense decision and the tile_m choice at N=4096 are measured, not
guessed (ops/pointwise_conv.py puts N=4096 exactly at the n_j >= 8 CSR
threshold).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="csr auto only, default tiles")
    ap.add_argument("--subblock", action="store_true",
                    help="sub-block overlap-save variants, small-radius "
                         "layers only (round-5 seg lever)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pointwise_tpu.data import s3dis
    from pointwise_tpu.ops import pointwise_conv
    from pointwise_tpu.train.configs import SegmentationConfig
    from pointwise_tpu.utils.runtime import (enable_compile_cache,
                                             profile_device_time, sync)

    enable_compile_cache()
    B, N = args.batch, args.points
    cfg = SegmentationConfig(name="sweep", num_classes=5, batch_size=B,
                             num_points=N)
    blocks = s3dis.training_blocks(cfg)
    pts = jnp.asarray(blocks["points"][:B])          # morton-sorted blocks
    mask = jnp.asarray(blocks["mask"][:B])
    print(f"# B={B} N={N} block_size={cfg.block_size} "
          f"radii={cfg.radii} channels={cfg.channels}", flush=True)

    layers = []
    cin = cfg.in_features
    for r, cout in zip(cfg.radii, cfg.channels):
        layers.append((r, cin, cout))
        cin = cout

    # variant = (name, csr, tile_m, subblock, subblock_cap)
    variants = [("auto", None, None, None, None)]
    if args.subblock:
        # sub-block overlap-save (round-5 lever): only the small-radius
        # layers can fit a useful cap — bigger radii hit the runtime dense
        # fallback and just re-measure the baseline.
        layers_filter = (0, 1)
        variants = [
            ("auto", None, None, None, None),
            ("sub8", None, None, 8, None),          # cap = 3x512 = 1536
            ("sub8_c3k", None, None, 8, 3072),
            ("sub16_c2k", None, None, 16, 2048),
        ]
    elif not args.quick:
        # Measured round 5 (GOLDEN seg attribution): finer candidate tiles
        # LOSE (tm256/tm128 ~= dense at L0 — inactive CSR grid steps cost
        # as much as the pruning saves, and 512-pt morton octants of a 1 m
        # block all touch, so tm512 can't prune either) — the decisive
        # comparison is forced csr vs forced dense per layer.
        variants = [("csr", True, None, None, None),
                    ("dense", False, None, None, None)]

    key = jax.random.PRNGKey(0)
    for li, (radius, cin, cout) in enumerate(layers):
        if args.subblock and li not in layers_filter:
            continue
        feats = jax.random.normal(jax.random.fold_in(key, li), (B, N, cin))
        w = jax.random.normal(jax.random.fold_in(key, 100 + li),
                              (27, cin, cout)) * 0.1
        for name, csr, tile_m, sub, sub_cap in variants:
            kw = dict(radius=radius, mask=mask, precision="bfloat16",
                      csr=csr, tile_m=tile_m, subblock=sub,
                      subblock_cap=sub_cap)

            fwd = jax.jit(lambda f, w_, kw=kw: pointwise_conv(
                pts, f, w_, None, **kw))

            def loss(f, w_, kw=kw):
                y = pointwise_conv(pts, f, w_, None, **kw)
                return jnp.sum(y * y)

            gw = jax.jit(jax.grad(loss, argnums=1))
            gx = jax.jit(jax.grad(loss, argnums=0))
            row = {}
            for tag, fn in (("fwd", lambda: fwd(feats, w)),
                            ("dW", lambda: gw(feats, w)),
                            ("dX", lambda: gx(feats, w))):
                try:
                    sync(fn())
                    dt = profile_device_time(
                        fn, logdir=f"/tmp/pw_seg_sweep_{li}_{name}_{tag}",
                        iters=args.iters)
                    row[tag] = dt * 1e3 if dt else float("nan")
                except Exception as e:
                    row[tag] = float("nan")
                    row[f"{tag}_err"] = repr(e)[:80]
            tot = row.get("fwd", 0) + row.get("dW", 0) + row.get("dX", 0)
            print(f"L{li} r={radius:4.2f} c{cin:>3}->{cout:<3} "
                  f"{name:>12}: fwd {row.get('fwd', float('nan')):7.3f}  "
                  f"dW {row.get('dW', float('nan')):7.3f}  "
                  f"dX {row.get('dX', float('nan')):7.3f}  "
                  f"sum {tot:7.3f} ms"
                  + ("".join(f"  [{k}:{v}]" for k, v in row.items()
                             if k.endswith("_err"))), flush=True)


if __name__ == "__main__":
    main()
