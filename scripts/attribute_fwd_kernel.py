#!/usr/bin/env python
"""Per-stage DEVICE attribution of the resident forward conv kernel.

VERDICT r3 item 4: ~0.23 of nominal was unattributed in the forward kernel.
jax.named_scope boundaries inside a Mosaic kernel lower to
tpu.trace_start/trace_stop (jax/_src/pallas/mosaic/lowering.py), so an
``annotate=True`` spec gives xprof trace events for each stage:

  mask_code  — float cell-code build (_pairwise_code), once per cand tile
  mask_cmp   — (code == k) compare+select, 27x per cand tile
  mxu_bin    — binning matmul plane @ x, 27x per cand tile
  finalize   — counts divide + (TN, 27*Cinp) @ (27*Cinp, Coutp) + bias

Usage: python scripts/attribute_fwd_kernel.py [cin] [iters]
Prints per-stage totals (ms/call) from the trace's device plane, next to
the un-annotated kernel's device time (the trace ops can constrain the
Mosaic scheduler, so the annotated total may exceed the production time —
report both and attribute proportionally).
"""
import collections
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointwise_tpu.ops import pointwise_conv
from pointwise_tpu.utils.runtime import (enable_compile_cache,
                                         profile_device_time, sync)


def main():
    enable_compile_cache()
    B, N, radius = 64, 1024, 0.5
    cin = cout = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.1

    import importlib

    kmod = importlib.import_module(
        "pointwise_tpu.kernels.pointwise_conv_pallas")
    opmod = importlib.import_module("pointwise_tpu.ops.pointwise_conv")
    orig_spec = kmod.PwConvSpec

    def make(annotate):
        def patched(*a, **kw):
            kw["resident"] = True
            kw["annotate"] = annotate
            return orig_spec(*a, **kw)
        opmod.PwConvSpec = patched
        fn = jax.jit(lambda f, w_: pointwise_conv(
            pts, f, w_, None, radius=radius, precision="bfloat16"))
        sync(fn(feats, w))
        return fn

    base = make(False)
    t_plain = profile_device_time(lambda: base(feats, w), iters=iters)
    print(f"un-annotated kernel: {t_plain*1e3:.3f} ms/call (device plane)")

    fn = make(True)
    logdir = "/tmp/pw_attr_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    sync(fn(feats, w))
    jax.profiler.start_trace(logdir)
    try:
        r = None
        for _ in range(iters):
            r = fn(feats, w)
        sync(r)
    finally:
        jax.profiler.stop_trace()
    opmod.PwConvSpec = orig_spec

    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not files:
        print("no trace produced")
        return
    pd = jax.profiler.ProfileData.from_file(files[-1])
    per_name = collections.Counter()
    n_events = collections.Counter()
    t_annot = 0.0
    for plane in pd.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            tot = sum(ev.duration_ns for ev in line.events)
            t_annot = max(t_annot, tot)
            for ev in line.events:
                for tag in ("mask_code", "mask_cmp", "mxu_bin", "finalize"):
                    if tag in ev.name:
                        per_name[tag] += ev.duration_ns
                        n_events[tag] += 1
    t_annot = t_annot / 1e9 / iters
    print(f"annotated kernel total: {t_annot*1e3:.3f} ms/call "
          f"(scheduler may be constrained by trace ops)")
    tagged = sum(per_name.values()) / 1e9 / iters
    for tag, ns in per_name.most_common():
        t = ns / 1e9 / iters
        print(f"  {tag:10s} {t*1e3:8.3f} ms/call  ({n_events[tag]//iters} "
              f"events/call)  {t/t_annot:5.1%} of annotated total")
    print(f"  {'untagged':10s} {(t_annot-tagged)*1e3:8.3f} ms/call  "
          f"(pipeline/fetch/write + anything outside scopes)")
    if not per_name:
        print("  (no tagged events found — dumping top event names)")
        names = collections.Counter()
        for plane in pd.planes:
            if plane.name.startswith("/device:"):
                for line in plane.lines:
                    for ev in line.events:
                        names[ev.name] += ev.duration_ns
        for nm, ns in names.most_common(25):
            print(f"    {ns/1e6:9.2f} ms total  {nm[:90]}")


if __name__ == "__main__":
    main()
