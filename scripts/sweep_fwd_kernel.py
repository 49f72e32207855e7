#!/usr/bin/env python
"""Dev sweep: forward conv kernel variants on the real TPU.

Times the bench-config forward pass (B=64, N=1024, cin=cout=64, r=0.5,
bf16) across mask modes and tile shapes, printing the implied MXU
utilization.  'const' is a timing-floor ablation (wrong numerics).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointwise_tpu.ops import pointwise_conv
from pointwise_tpu.utils.runtime import enable_compile_cache

LAUNCH_LATENCY_S = 0.0008


def sync(r):
    return float(jnp.sum(r.astype(jnp.float32)))


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    enable_compile_cache()
    B, N, radius = 64, 1024, 0.5
    cin = cout = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.1

    def rup(x, m=128):
        return (x + m - 1) // m * m
    cinp, coutp, npad = rup(cin + 1), rup(cout), rup(N)
    flops = B * (npad // 128) * 27 * 2 * 128 * npad * cinp \
        + B * (npad // 128) * 27 * 2 * 128 * cinp * coutp
    peak = 197e12

    import importlib

    kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
    opmod = importlib.import_module("pointwise_tpu.ops.pointwise_conv")

    combos = []
    for res in (True,):
        for mode in ("const", "compare"):
            for tn, tm in ((256, 512), (128, 512)):
                combos.append((mode, res, tn, tm))

    orig_spec = kmod.PwConvSpec
    for mode, res, tn, tm in combos:
        def conv(f, w_, mode=mode, tn=tn, tm=tm):
            return pointwise_conv(
                pts, f, w_, None, radius=radius, precision="bfloat16",
                mask_mode=mode, tile_n=tn, tile_m=tm)
        if res:
            def patched(*a, **kw):
                kw["resident"] = True   # override: ops always passes it
                return orig_spec(*a, **kw)
            opmod.PwConvSpec = patched
        else:
            opmod.PwConvSpec = orig_spec
        fwd = jax.jit(conv)
        try:
            t = max(timeit(lambda: fwd(feats, w)) - LAUNCH_LATENCY_S, 1e-9)
        except Exception as e:
            print(f"{mode:9s} res={int(res)} tn={tn:4d} tm={tm:5d}  FAILED: "
                  f"{e!r}"[:150], flush=True)
            continue
        print(f"{mode:9s} res={int(res)} tn={tn:4d} tm={tm:5d}  "
              f"t_fwd={t*1e3:7.3f} ms  mxu={flops / t / peak:6.3f}",
              flush=True)
    opmod.PwConvSpec = orig_spec


if __name__ == "__main__":
    main()
