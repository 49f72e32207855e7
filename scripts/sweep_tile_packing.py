#!/usr/bin/env python
"""Measured ablation for the round-2 'lane packing' proposal (VERDICT r2
task 2) — see GOLDEN.md for the analysis and verdict.

The proposal: when cin+1 <= 64, pack TWO candidate tiles' features
side-by-side in the 128-lane feature block so two X blocks share one
binning matmul.  Lane-packing as literally stated is not computable in one
matmul — a mask plane M (TN, TM) applies the SAME per-candidate scalar to
every lane of X's row j, but the two packed candidates in row j have
DIFFERENT cell memberships per center, so they need different mask values
in the same matmul cell.  Giving each its own plane is just two matmuls
again (no saving), and stacking the tiles along TM instead is EXACTLY a
tile_m=2*TM walk — fewer, bigger matmuls with identical executed FLOPs.
That stacked formulation is the measurable remnant of the idea, and this
sweep measures it: tile_m in {256, 512, 1024} x tile_n in {128, 256} at
the bench config, timed on the DEVICE plane of a jax.profiler trace
(immune to the axon tunnel's 0.7-2.5 ms dispatch).

Run on the real chip:  python scripts/sweep_tile_packing.py [cin]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointwise_tpu.ops import pointwise_conv
from pointwise_tpu.utils.runtime import enable_compile_cache


def main():
    enable_compile_cache()
    from bench import profile_device_time

    B, N, radius = 64, 1024, 0.5
    cin = cout = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.1

    def rup(x, m=128):
        return (x + m - 1) // m * m

    cinp, coutp, npad = rup(cin + 1), rup(cout), rup(N)
    flops = (B * (npad // 128) * 27 * 2 * 128 * npad * cinp
             + B * (npad // 128) * 27 * 2 * 128 * cinp * coutp)
    peak = 197e12

    ref = None
    for tile_n in (128, 256):
        for tile_m in (256, 512, 1024):
            fwd = jax.jit(lambda f, w_, tn=tile_n, tm=tile_m: pointwise_conv(
                pts, f, w_, None, radius=radius, precision="bfloat16",
                tile_n=tn, tile_m=tm))
            try:
                t_dev = profile_device_time(lambda: fwd(feats, w))
            except Exception as e:
                print(f"tile_n={tile_n} tile_m={tile_m}: FAILED {e!r}"[:120])
                continue
            if not t_dev:
                print(f"tile_n={tile_n} tile_m={tile_m}: no trace")
                continue
            util = flops / t_dev / peak
            tag = ""
            if tile_n == 256 and tile_m == 512:
                ref = t_dev
                tag = "  <- bench default"
            print(f"tile_n={tile_n} tile_m={tile_m}: t_dev={t_dev*1e3:.3f} ms"
                  f"  util(nominal)={util:.3f}{tag}")
    if ref:
        print(f"# default t_dev {ref*1e3:.3f} ms; a real packing win would "
              f"show tile_m=1024 clearly beating tile_m=512")


if __name__ == "__main__":
    main()
