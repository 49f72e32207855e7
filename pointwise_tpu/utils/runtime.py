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


def enable_compile_cache(path: str | None = None) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", path or _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def sync(tree) -> float:
    """Block until everything `tree` depends on has executed."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


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
