#!/usr/bin/env python
"""Per-stage DEVICE attribution of the resident forward conv kernel.

VERDICT r3 item 4: ~0.23 of nominal was unattributed in the forward kernel.

Primary method — bisection sweep (``--sweep``, default): time DCE-proof
kernel ablations on the device plane and decompose linearly.

  t(K, mode) = intercept + K * slope(mode)      for K emitted planes

  * mode='compare' (production): plane = (code == k), compare+select/plane
  * mode='scaled' (ablation):    plane = code * c_k, one VPU multiply/plane
    — same matmul count and shapes (distinct c_k defeats CSE), so
    slope(compare) - slope(scaled) = the per-plane mask-compare VPU cost,
    and slope(scaled) ~= per-plane binning matmul + pipeline cost (+1 mul).
  * intercept = cell-code build + finalize matmul + fixed pipeline overhead.

Fallback method (``--marks``): jax.named_scope boundaries inside a Mosaic
kernel lower to tpu.trace_start/trace_stop (verified: 111 trace ops emitted
in lowering with spec.annotate=True, zero device-time perturbation), but the
axon profiler plugin DROPS in-kernel trace marks at every exposed option
(probed: default, tpu_trace_level, trace_level, tpu_trace_mode,
tpu_ultra_low_overhead, host_tracer_level=3 — all 0 tagged events).  Kept
for stacks whose profiler surfaces level-10 marks.

Backward attribution (``--bwd``): times grad-w-only / grad-f-only / full
gradient programs on the device plane — dW and dX are independent
pallas_calls inside the custom VJP, so jaxpr DCE isolates each kernel —
and reports each against the shared pure-MXU walk ideal.

Usage: python scripts/attribute_fwd_kernel.py [--marks|--bwd] [cin] [iters]
"""
import collections
import glob
import importlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.ops import pointwise_conv
from pointwise_tpu.utils.runtime import (enable_compile_cache,
                                         profile_device_time, sync)

kmod = importlib.import_module("pointwise_tpu.kernels.pointwise_conv_pallas")
opmod = importlib.import_module("pointwise_tpu.ops.pointwise_conv")

B, N, RADIUS = 64, 1024, 0.5
NOMINAL_TF = 197e12


def _make_fn(pts, feats, w, **spec_overrides):
    orig_spec = opmod.PwConvSpec
    # tile_m is an op-level knob (the geometry layout must tile to match),
    # not a spec override — route it through the call
    op_tile_m = spec_overrides.pop("tile_m", None)

    def patched(*a, **kw):
        kw["resident"] = True
        kw.update(spec_overrides)
        return orig_spec(*a, **kw)

    opmod.PwConvSpec = patched
    try:
        fn = jax.jit(lambda f, w_: pointwise_conv(
            pts, f, w_, None, radius=RADIUS, precision="bfloat16",
            tile_m=op_tile_m))
        # jit is lazy: force tracing+compile while the spec patch is active
        # (the spec_overrides kwargs are the whole point of this function).
        sync(fn(feats, w))
        return fn
    finally:
        opmod.PwConvSpec = orig_spec


def _detail(fn, feats, w, iters):
    """(program_ms, kernel_ms, staging_issued_ms) off one trace: module-line
    total, pallas custom-call op events, and the async pad/transpose/copy
    staging ops (which OVERLAP the kernel — their sum can exceed wall)."""
    logdir = "/tmp/pw_attr_detail"
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
    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    pd = jax.profiler.ProfileData.from_file(files[-1])
    module = kern = stage = 0.0
    for plane in pd.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            tot = sum(ev.duration_ns for ev in line.events)
            if any(ev.name.startswith("jit") for ev in line.events):
                module = max(module, tot)
            for ev in line.events:
                nm = ev.name
                if nm.startswith("jit"):
                    continue
                if "custom" in nm or "_lambda_" in nm:
                    kern += ev.duration_ns
                elif any(s in nm for s in ("slice-start", "dynamic-update",
                                           "copy", "convert", "pad")):
                    stage += ev.duration_ns
    s = 1e-6 / iters
    return module * s, kern * s, stage * s


def sweep(cin, iters):
    cout = cin
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.1

    cin_p = 128  # padded (counts column included)
    per_plane_tf = 2 * B * N * N * cin_p / 1e12
    finalize_tf = 2 * B * N * (27 * cin_p) * 128 / 1e12
    mm_ideal = per_plane_tf / NOMINAL_TF * 1e15     # ms/plane at nominal
    fin_ideal = finalize_tf / NOMINAL_TF * 1e15
    print(f"model: binning {per_plane_tf*1e3:.2f} GF/plane "
          f"({mm_ideal:.4f} ms at nominal), finalize {finalize_tf*1e3:.2f} "
          f"GF ({fin_ideal:.4f} ms at nominal)")

    times = {}
    for mode, K in [("compare", 9), ("compare", 18), ("compare", 27),
                    ("scaled", 27), ("compare", 0)]:
        fn = _make_fn(pts, feats, w, mask_mode=mode, num_emit=K)
        prog, kern, stage = _detail(fn, feats, w, iters)
        times[(mode, K)] = (prog, kern, stage)
        print(f"  {mode:8s} K={K:2d}: program {prog:7.3f} ms, kernel "
              f"{kern:7.3f} ms, staging issued {stage:6.3f} ms")

    prog27, kern27, stage27 = times[("compare", 27)]
    prog0, kern0, _ = times[("compare", 0)]
    slope = (times[("compare", 27)][0] - times[("compare", 18)][0]) / 9.0
    binning = kern27 - kern0
    exposed = prog27 - kern27
    print(f"\nmarginal plane cost (K 18->27): {slope:.4f} ms "
          f"({slope/mm_ideal:.2f}x nominal ideal {mm_ideal:.4f})")
    print(f"scaled-mask kernel delta (mask VPU exposure): "
          f"{times[('scaled', 27)][1] - kern27:+.3f} ms")
    print(f"\nattribution of the production program ({prog27:.3f} ms @ "
          f"cin={cin}):")
    rows = [
        ("pallas kernel total", kern27),
        ("  binning candidate walk (kernel K27-K0)", binning),
        ("    vs 27-plane pure-MXU ideal", 27 * mm_ideal),
        ("  finalize + kernel fixed (kernel K0)", kern0),
        ("    vs finalize pure-MXU ideal", fin_ideal),
        ("exposed input staging (program - kernel)", exposed),
        (f"  (staging issued {stage27:.3f} ms, mostly overlapped)", None),
    ]
    for name, ms in rows:
        if ms is None:
            print(f"  {name}")
        else:
            print(f"  {name:45s} {ms:7.3f} ms  {ms/prog27:6.1%}")
    ideal = 27 * mm_ideal + fin_ideal
    print(f"  ideal-compute / program = {ideal/prog27:.3f} "
          f"(= the executed-utilization reading)")


def ksweep2(cin, iters):
    """VERDICT r4 weak #2: 'pipeline fill per j-step' predicts a tile_m=1024
    win (half the j-steps), but the round-3 packing sweep measured tile_m
    512->1024 FLAT.  Probe both hypotheses at once: a dense K grid below 18
    (is the slope nonlinear in the early planes?) x tile_m in {512, 1024}
    (does the fixed overhead scale with j-steps?).  If the overhead is
    per-j-step fill, intercepts should differ by ~2x between tile_m's; if
    the early-plane slope is higher, the K curve is convex near 0."""
    cout = cin
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.1

    cin_p = 128
    per_plane_tf = 2 * B * N * N * cin_p / 1e12
    mm_ideal = per_plane_tf / NOMINAL_TF * 1e15
    print(f"model: {mm_ideal:.4f} ms/plane at nominal")
    ks = [0, 3, 6, 9, 18, 27]
    for tm in (512, 1024):
        rows = []
        for K in ks:
            fn = _make_fn(pts, feats, w, mask_mode="compare", num_emit=K,
                          tile_m=tm)
            prog, kern, stage = _detail(fn, feats, w, iters)
            rows.append((K, prog, kern))
            print(f"  tm={tm} K={K:2d}: program {prog:7.3f} ms, "
                  f"kernel {kern:7.3f} ms, staging {stage:6.3f} ms",
                  flush=True)
        for (k0, p0, _), (k1, p1, _) in zip(rows, rows[1:]):
            sl = (p1 - p0) / (k1 - k0)
            print(f"  tm={tm} slope K{k0}->K{k1}: {sl:.4f} ms/plane "
                  f"({sl / mm_ideal:.2f}x ideal)")
        print(f"  tm={tm} intercept (K=0 program): {rows[0][1]:.3f} ms",
              flush=True)


def _make_grad_fn(pts, feats, w, wrt, **spec_overrides):
    """jit'd grad of sum(conv**2) w.r.t. 'w', 'f', or 'both'.

    dW and dX are independent pallas_calls inside the custom VJP, so jaxpr
    DCE drops the one whose cotangent is unused — grad-w programs run
    fwd + dW only, grad-f programs fwd + dX only (cross-checked below:
    t(grad_w) + t(grad_f) - t(fwd) must reproduce t(grad_both))."""
    orig_spec = opmod.PwConvSpec

    def patched(*a, **kw):
        kw["resident"] = True
        kw.update(spec_overrides)
        return orig_spec(*a, **kw)

    def loss(f, w_):
        y = pointwise_conv(pts, f, w_, None, radius=RADIUS,
                           precision="bfloat16")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    argnums = {"f": 0, "w": 1, "both": (0, 1)}[wrt]
    opmod.PwConvSpec = patched
    try:
        fn = jax.jit(jax.grad(loss, argnums=argnums))
        sync(fn(feats, w))
        return fn
    finally:
        opmod.PwConvSpec = orig_spec


def bwd(cin, iters, dx_flip=False):
    """Backward (dW/dX) attribution — mirrors the forward sweep.

    Both gradient kernels re-run the 27-plane candidate walk (dW rebuilds
    the cell sums, dX builds Z_k = M_k^T (g/cnt_k)), so each has the same
    pure-MXU walk ideal as the forward, plus one finalize-shaped matmul
    (xcat^T @ g for dW, zcat @ W^T for dX)."""
    cout = cin
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cout)) * 0.1

    cin_p = 128
    per_plane_tf = 2 * B * N * N * cin_p / 1e12
    finalize_tf = 2 * B * N * (27 * cin_p) * 128 / 1e12
    kernel_ideal = (27 * per_plane_tf + finalize_tf) / NOMINAL_TF * 1e15

    fwd = _make_fn(pts, feats, w)
    t_fwd, _, _ = _detail(fwd, feats, w, iters)
    grads = {}
    for wrt in ("w", "f", "both"):
        fn = _make_grad_fn(pts, feats, w, wrt, dx_flip=dx_flip)
        prog, kern, stage = _detail(fn, feats, w, iters)
        grads[wrt] = prog
        print(f"  grad_{wrt:4s}: program {prog:7.3f} ms, pallas kernels "
              f"{kern:7.3f} ms, staging issued {stage:6.3f} ms")
    t_dw = grads["w"] - t_fwd
    t_dx = grads["f"] - t_fwd
    recon = t_fwd + t_dw + t_dx
    print(f"\nfwd {t_fwd:.3f} ms | dW {t_dw:.3f} ms | dX {t_dx:.3f} ms "
          f"(each vs kernel ideal {kernel_ideal:.3f} ms: "
          f"fwd {kernel_ideal/t_fwd:.3f}, dW {kernel_ideal/t_dw:.3f}, "
          f"dX {kernel_ideal/t_dx:.3f})")
    print(f"DCE cross-check: fwd+dW+dX = {recon:.3f} ms vs grad_both "
          f"{grads['both']:.3f} ms (ratio {recon/grads['both']:.3f})")
    print(f"fwd+bwd executed utilization vs nominal: "
          f"{3*kernel_ideal/grads['both']:.3f}")


def marks(cin, iters):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1)
    feats = jax.random.normal(k[1], (B, N, cin))
    w = jax.random.normal(k[2], (27, cin, cin)) * 0.1

    base = _make_fn(pts, feats, w)
    t_plain = profile_device_time(lambda: base(feats, w), iters=iters)
    print(f"un-annotated kernel: {t_plain*1e3:.3f} ms/call (device plane)")

    fn = _make_fn(pts, feats, w, annotate=True)
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

    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not files:
        print("no trace produced")
        return
    pd = jax.profiler.ProfileData.from_file(files[-1])
    per_name = collections.Counter()
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
    t_annot = t_annot / 1e9 / iters
    print(f"annotated kernel total: {t_annot*1e3:.3f} ms/call")
    if not per_name:
        print("no tagged events — this profiler drops in-kernel trace marks"
              " (known axon-plugin behavior); use the default --sweep mode")
        return
    for tag, ns in per_name.most_common():
        t = ns / 1e9 / iters
        print(f"  {tag:10s} {t*1e3:8.3f} ms/call  {t/t_annot:5.1%}")


def main():
    enable_compile_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cin = int(args[0]) if args else 64
    iters = int(args[1]) if len(args) > 1 else 8
    if "--marks" in sys.argv:
        marks(cin, iters)
    elif "--bwd" in sys.argv:
        # --flip: the dx_flip on-chip A/B (GOLDEN round-4 backward section)
        bwd(cin, iters, dx_flip="--flip" in sys.argv)
    elif "--ksweep2" in sys.argv:
        # VERDICT r4 weak #2: dense K grid x tile_m (see ksweep2 docstring)
        ksweep2(cin, iters)
    else:
        sweep(cin, iters)


if __name__ == "__main__":
    main()
