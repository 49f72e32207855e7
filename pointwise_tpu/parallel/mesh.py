"""Device mesh helpers (SURVEY.md C12/C13).

The reference has no parallelism at all (single process, CPU op).  The
rebuild scales through ``jax.sharding.Mesh`` + XLA collectives over ICI/DCN:

  * ``data``  — batch-dim data parallelism (the primary strategy: these
    models are tiny, the data is big);
  * ``space`` — point-dim ("spatial") parallelism for scans that exceed one
    chip, the structural analog of sequence/context parallelism.

Tensor/pipeline/expert parallelism are deliberately absent: the widest layer
is ~256 channels and the deepest net 6 convs (SURVEY.md section 2 table) —
there is nothing to shard or pipeline at that scale.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None,
    space: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Mesh over (data, space). data=None uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % space:
            raise ValueError(f"{n} devices not divisible by space={space}")
        data = n // space
    if data * space > n:
        raise ValueError(f"mesh {data}x{space} needs {data*space} devices, have {n}")
    arr = np.array(devices[: data * space]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def init_distributed(**kwargs) -> bool:
    """Multi-host entry point (TPU pods / multi-slice over DCN).

    Call ONCE per host process, before ``make_mesh()`` and before any other
    jax use.  When a coordinator is configured — explicitly via kwargs
    (``coordinator_address=…, num_processes=…, process_id=…``) or through
    jax's own env contract (``JAX_COORDINATOR_ADDRESS``, plus
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` where the platform cannot
    auto-detect them) — this initializes the jax distributed runtime, after
    which ``jax.devices()`` spans every host and the SAME
    Mesh/Trainer/streaming code runs unchanged: GSPMD keeps intra-slice
    collectives on ICI and emits DCN collectives across slices.  Feed
    per-host data through :func:`host_local_batch_to_global`.

    Returns True when distributed mode was initialized, False when no
    coordinator is configured (single-process environments — a no-op, so
    CLIs can call it unconditionally).  Deliberately keyed on jax's OWN env
    name, not a generic ``COORDINATOR_ADDRESS`` (an unrelated service
    exporting that must not make the CLIs dial out), and deliberately does
    NOT probe cloud metadata when unconfigured: that hangs in air-gapped
    environments.
    """
    if not (kwargs.get("coordinator_address")
            or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        return False
    jax.distributed.initialize(**kwargs)
    return True


def host_local_batch_to_global(mesh: Mesh, batch, batch_axis: str = "data"):
    """Assemble a global batch from per-process shards (multi-host feeding).

    Under multi-host SPMD each process loads only ITS slice of the global
    batch (global_batch / process_count rows, leading dim).  The jitted
    step's ``in_shardings`` describe the GLOBAL array, so host-local numpy
    must be promoted to a global ``jax.Array`` first — this wraps
    ``jax.make_array_from_process_local_data`` over the batch pytree.

    Single-process (this CI, one chip): returns the batch unchanged — jit
    shards plain host arrays directly, so the call is free and the same
    training loop works in both worlds.
    """
    if jax.process_count() == 1:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(batch_axis))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
        batch,
    )
