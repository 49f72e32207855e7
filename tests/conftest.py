"""Test env: run everything on CPU with 8 virtual devices.

SURVEY.md section 4 tier 5 — "distributed without a cluster": all sharding /
DP / halo tests run on a fake 8-device CPU mesh; the same Mesh code paths run
unchanged on a real TPU slice.  Pallas kernels run in interpreter mode on CPU
(the op layer auto-detects the backend).

NOTE: the axon TPU plugin ignores ``JAX_PLATFORMS``; ``JAX_PLATFORM_NAME``
and the ``jax_platforms`` config flag do work, so set all of them.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Keep reference-impl einsums at full f32 so kernel-vs-reference tolerances
# are meaningful if a TPU backend ever leaks through.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
