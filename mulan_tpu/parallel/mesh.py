"""Device mesh and sharding policy.

The reference scales with `jax.pmap('batch')` + `flax_utils.replicate`
(/root/reference/ldm/experiment.py:89-102, 218) — per-device leading axes,
host-side unreplicate, NCCL collectives. The TPU-native replacement is a
1-D (extensible to 2-D data x fsdp) `jax.sharding.Mesh` over all chips with
`jit` + `NamedSharding`:

  * params / EMA / optimizer state: fully replicated,
  * batches: sharded along the mesh 'data' axis,
  * gradients: XLA inserts the psum over ICI automatically when the loss is a
    mean over the sharded batch axis.

No leading device axis anywhere; the same program runs on 1 chip, a v5e pod
slice, or the 8-virtual-device CPU test mesh unchanged. For multi-host, call
`jax.distributed.initialize()` first (see train.loop) — `jax.devices()` then
spans all processes and `shard_batch` uses
`make_array_from_process_local_data` to assemble global arrays from per-host
shards.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
  """1-D data-parallel mesh over all (or the given) devices."""
  if devices is None:
    devices = jax.devices()
  return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
  """Shard the given array axis over the mesh's data axis."""
  spec = [None] * (batch_axis + 1)
  spec[batch_axis] = DATA_AXIS
  return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
  """Place a (possibly per-host) numpy batch onto the mesh.

  Single-process: a straight device_put with the batch axis sharded.
  Multi-process: each host passes its local shard; the global array is
  assembled across processes (the host-sharded data layout mirrors the
  reference's `get_read_instruction_for_host`, dataset.py:264-265).
  """
  sharding = batch_sharding(mesh, batch_axis)

  def _put(x):
    if jax.process_count() > 1:
      return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)

  return jax.tree.map(_put, batch)


def local_batch_size(global_batch: int,
                     process_count: Optional[int] = None) -> int:
  pc = process_count if process_count is not None else jax.process_count()
  if global_batch % pc != 0:
    raise ValueError(f'global batch {global_batch} not divisible by '
                     f'process count {pc}')
  return global_batch // pc
