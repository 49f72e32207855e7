"""Host -> HBM input pipeline: double-buffered device prefetch.

The reference feeds every step through a TF-1 feed_dict (a host->runtime
copy on the critical path, SURVEY.md section 3.1).  Here batches are staged
onto the device ahead of the step that consumes them: the device_put of
batch k+1 overlaps the compute of batch k, so the training step never waits
on PCIe/DMA (BASELINE.json: "double-buffered host->HBM input pipeline").
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterable, Iterator

import jax


def prefetch_to_device(
    it: Iterable[dict], size: int = 2, sharding=None
) -> Iterator[dict]:
    """Stage ``size`` batches ahead on device (or with ``sharding``).

    ``sharding`` may be a sharding (pytree of shardings matching the batch),
    or a zero-arg callable returning one — re-read per batch, so callers
    whose shardings are built lazily (Trainer's SPMD batch specs appear at
    the first step) stage straight to the right placement from then on.
    Staging to the default device under a mesh still works, but pays an
    extra device-to-device scatter at dispatch.
    """
    queue = collections.deque()
    it = iter(it)

    def put(batch):
        if jax.process_count() > 1:
            # multi-host: leave the batch on HOST — a global sharding cannot
            # be fed from per-process data here, and a local device_put
            # would only be pulled straight back for
            # Trainer._promote_batch's global assembly
            return batch
        sh = sharding() if callable(sharding) else sharding
        if sh is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sh)

    for batch in itertools.islice(it, size):
        queue.append(put(batch))
    while queue:
        yield queue.popleft()
        for batch in itertools.islice(it, 1):
            queue.append(put(batch))
