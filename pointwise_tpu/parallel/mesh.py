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
