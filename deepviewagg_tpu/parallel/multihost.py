"""Multi-host orchestration: process-sharded input + distributed init.

The reference is single-process (SURVEY.md §2.8); the TPU framework's
multi-host story (SURVEY.md §5 'distributed communication backend' row):

  * ``initialize()`` — ``jax.distributed.initialize`` when launched across
    hosts (JAX coordinates through the TPU runtime on Cloud TPU pods; env
    vars / explicit args elsewhere);
  * each host builds batches for ITS local devices only
    (:class:`HostShardedLoader` splits the area/sample space by
    ``process_index``), then ``jax.make_array_from_single_device_arrays``
    assembles the global sharded batch — collectives ride ICI within a
    slice, DCN across slices, inserted by XLA from the sharding;
  * checkpoint writes happen on process 0 only (``is_primary``).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = ["initialize", "is_primary", "HostShardedLoader",
           "global_device_batch"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime (no-op when single-process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_primary() -> bool:
    return jax.process_index() == 0


class HostShardedLoader:
    """Wrap a BatchLoader-style iterable so each host consumes a disjoint
    shard of the sample space: sample index ``i`` belongs to host
    ``i % process_count`` — the per-host input pipeline that replaces the
    reference's DataLoader workers at pod scale."""

    def __init__(self, make_loader, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.make_loader = make_loader
        self.pi = (jax.process_index() if process_index is None
                   else process_index)
        self.pc = (jax.process_count() if process_count is None
                   else process_count)

    def __iter__(self) -> Iterator:
        for i, batch in enumerate(self.make_loader()):
            if i % self.pc == self.pi:
                yield batch


def global_device_batch(per_device_batches: Sequence, mesh) -> object:
    """Assemble host-local batches into one globally-sharded array pytree.

    ``per_device_batches`` has one bucket-shaped batch per LOCAL device;
    the result is a pytree of global jax.Arrays sharded over the mesh's
    leading ('data') axis — pass straight into the pjit'd step.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    local = jax.local_devices()
    assert len(per_device_batches) == len(local)
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    def make(*leaves):
        shards = [
            jax.device_put(np.asarray(leaf)[None], d)
            for leaf, d in zip(leaves, local)
        ]
        global_shape = (len(mesh.devices),) + np.asarray(leaves[0]).shape
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards
        )

    return jax.tree_util.tree_map(make, *per_device_batches)
