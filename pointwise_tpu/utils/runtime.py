"""Runtime helpers: persistent compile cache, reliable sync, profiling.

The axon TPU tunnel has two quirks this module centralizes:
  * first compiles are slow -> persistent compilation cache keyed on HLO;
  * ``block_until_ready`` can return before the device finishes -> the only
    reliable barrier is a device->host transfer (``sync``).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import jax.numpy as jnp

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS``/``JAX_PLATFORM_NAME`` actually work.

    The axon TPU plugin IGNORES both env vars (re-verified round 4: a
    subprocess with JAX_PLATFORMS=cpu still initialized the 'axon'
    platform); only the ``jax_platforms`` config flag is respected.  The
    CLIs honor the env explicitly so subprocess CI runs really stay on the
    CPU backend instead of silently dispatching to the tunneled chip —
    which is both a hermeticity bug and, in degraded-tunnel hours, a hang.
    No-op once a backend exists (the config update raises then).
    """
    plats = os.environ.get("JAX_PLATFORMS") or os.environ.get(
        "JAX_PLATFORM_NAME")
    if plats:
        try:
            jax.config.update("jax_platforms", plats.lower())
        except Exception:
            pass


def enable_compile_cache(path: str | None = None) -> None:
    honor_platform_env()
    try:
        jax.config.update("jax_compilation_cache_dir", path or _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def sync(tree) -> float:
    """Block until everything the first leaf of `tree` depends on has
    executed (a device->host transfer is the only reliable barrier under
    the axon tunnel).  Empty trees are a no-op; leaves produced by
    UNRELATED dispatches are not ordered behind this transfer — sync the
    value you actually timed."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


@contextlib.contextmanager
def timed(label: str, sink=None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    msg = f"# [{label}] {dt*1e3:.1f} ms"
    (sink or print)(msg)


@contextlib.contextmanager
def profile(logdir: str = "/tmp/pointwise_tpu_profile"):
    """jax.profiler trace around a block (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def profile_device_time(fn, logdir: str = "/tmp/pointwise_tpu_devtime",
                        iters: int = 4) -> float | None:
    """Per-call DEVICE-side duration of ``fn``'s jitted program, from a
    jax.profiler trace.

    The only dispatch-immune timing under the axon tunnel (wall-clock minus
    a calibrated correction under-reports by ~1.5x — GOLDEN.md round 3):
    reads the /device: plane of the trace and returns seconds/call as the
    MODULE line's total jit-program duration (every program the call
    dispatches, so multi-program jits like the CSR center-chunked conv are
    fully counted; kernel plus in-program slices, slightly conservative
    for the kernel alone), or None when no module line exists.  ``fn``
    must be warmed/compiled by one prior call; this helper calls it once
    before tracing.

    NOTE: ``logdir`` is DELETED and rewritten on every call (own default,
    separate from ``profile()``'s, so it never clobbers a trace collected
    for xprof inspection); give concurrent processes distinct logdirs.
    """
    import glob
    import shutil

    iters = max(1, int(iters))
    shutil.rmtree(logdir, ignore_errors=True)
    sync(fn())                      # compiled before tracing
    jax.profiler.start_trace(logdir)
    try:
        r = None
        for _ in range(iters):
            r = fn()
        # barrier WITHOUT a compute dispatch: sync()'s jnp.sum would land
        # its own jit program on the module line inside the trace window,
        # inflating the per-call average (worst at iters=1)
        jax.device_get(jax.tree.leaves(r)[0])
    finally:
        jax.profiler.stop_trace()
    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not files:
        return None
    pd = jax.profiler.ProfileData.from_file(files[-1])
    best_module = max((plane_jit_ns(plane) for plane in pd.planes
                       if plane.name.startswith("/device:")), default=0.0)
    # No module line -> None (an honest miss).  The old busiest-line
    # fallback returned the async-copy line, whose overlapping events
    # OVER-report (see plane_jit_ns) — a number known to be wrong.
    return best_module / 1e9 / iters if best_module else None


def plane_jit_ns(plane) -> float:
    """One device plane's MODULE-line total: max over lines of the summed
    durations of jit-prefixed events, in ns.

    THE module-line selection rule — keep exactly one copy.  Two wrong
    variants already shipped and were fixed: taking the busiest line
    over-reports short programs (the async-copy line's events overlap each
    other and the kernel, so its sum exceeds wall — a 0.574 ms program
    read as 1.390 ms, GOLDEN round 4), and summing whole mixed lines
    inflates totals when a line carries jit and non-jit events
    (ADVICE r4, scripts/attribute_train_step.py).  A device-plane line is
    a non-overlapping sequence, and the module line's jit events cover
    EVERY program a call dispatches (multi-program jits fully counted).
    """
    return max((sum(ev.duration_ns for ev in line.events
                    if ev.name.startswith("jit"))
                for line in plane.lines), default=0.0)


def device_jit_seconds(logdir: str) -> float:
    """Whole-trace device jit-program time: plane_jit_ns summed across the
    /device: planes of the newest trace under ``logdir``, in seconds.
    NaN when no trace file exists.  The attribution scripts' shared
    accounting (scripts/attribute_streaming.py, attribute_train_step.py).
    """
    import glob

    files = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not files:
        return float("nan")
    pd = jax.profiler.ProfileData.from_file(files[-1])
    return sum(plane_jit_ns(plane) for plane in pd.planes
               if plane.name.startswith("/device:")) / 1e9
