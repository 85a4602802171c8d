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
FSDP_AXIS = 'fsdp'


def create_mesh(devices=None, fsdp: int = 1) -> Mesh:
  """Device mesh: 1-D ('data',) or, with fsdp > 1, 2-D ('data', 'fsdp').

  On the 2-D mesh batches shard over BOTH axes (every chip holds a batch
  shard) while parameters/EMA/optimizer state shard over 'fsdp' only
  (ZeRO-3-style; XLA inserts the per-op all-gathers and the grad
  reduce-scatter). fsdp=1 reproduces pure DP — the reference's only
  strategy (SURVEY section 2.7).
  """
  if devices is None:
    devices = jax.devices()
  devices = np.asarray(devices)
  if fsdp <= 1:
    return Mesh(devices, (DATA_AXIS,))
  assert len(devices) % fsdp == 0, (len(devices), fsdp)
  return Mesh(devices.reshape(len(devices) // fsdp, fsdp),
              (DATA_AXIS, FSDP_AXIS))


def _batch_axes(mesh: Mesh):
  """Batches shard over every mesh axis (data, and fsdp if present)."""
  return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
  """Shard the given array axis over all mesh axes."""
  spec = [None] * (batch_axis + 1)
  spec[batch_axis] = _batch_axes(mesh)
  return NamedSharding(mesh, P(*spec))


def fsdp_sharding(mesh: Mesh, shape) -> NamedSharding:
  """Parameter sharding: largest axis divisible by the fsdp size is sharded
  over 'fsdp'; everything else (and all leaves on a 1-D mesh) replicated."""
  if FSDP_AXIS not in mesh.axis_names or not shape:
    return NamedSharding(mesh, P())
  size = mesh.shape[FSDP_AXIS]
  candidates = [(dim, i) for i, dim in enumerate(shape) if dim % size == 0]
  if not candidates:
    return NamedSharding(mesh, P())
  _, axis = max(candidates)
  spec = [None] * len(shape)
  spec[axis] = FSDP_AXIS
  return NamedSharding(mesh, P(*spec))


# Param groups whose leaves stay replicated even under FSDP. The gamma
# schedule network is tiny next to the UNet but its outputs feed the
# dgamma/dt-weighted loss with (B, n_pixels) intermediates; sharding its
# parameters over 'fsdp' made XLA reshard every gamma gradient through
# "involuntary full rematerialization" collectives each step. Replicating the
# group keeps the schedule math local to each chip (its grads still ride the
# same data-axis psum as everything else).
REPLICATED_GROUPS = ('gamma',)


def _path_replicated(path) -> bool:
  for entry in path:
    name = getattr(entry, 'key', getattr(entry, 'name', None))
    if name in REPLICATED_GROUPS:
      return True
  return False


def _leaf_sharding(mesh: Mesh, path, x) -> NamedSharding:
  if _path_replicated(path):
    return NamedSharding(mesh, P())
  return fsdp_sharding(mesh, jnp_shape(x))


def shard_state(mesh: Mesh, state):
  """Place a TrainState on the mesh: every array leaf gets fsdp_sharding
  (replicated on a 1-D mesh) except leaves under REPLICATED_GROUPS; params,
  EMA and adam moments share layouts because they share tree paths."""
  return jax.tree_util.tree_map_with_path(
      lambda p, x: jax.device_put(x, _leaf_sharding(mesh, p, x)), state)


def jnp_shape(x):
  return getattr(x, 'shape', ())


def state_shardings(mesh: Mesh, state):
  """The sharding tree matching `shard_state` (for jit out_shardings)."""
  return jax.tree_util.tree_map_with_path(
      lambda p, x: _leaf_sharding(mesh, p, x), state)


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


def shard_host_padded(mesh: Mesh, batch: dict, n_valid: Optional[int] = None):
  """Pad a per-host batch dict to the local device count, attach a validity
  'mask', and place it on the mesh.

  The multi-host eval protocol shared by the dense-VLB and ODE evaluators:
  every process pads its local arrays (repeating leading rows) to a multiple
  of its local device count, a boolean 'mask' marks the real rows, and the
  mask rides THROUGH the jit (replicated outputs) so hosts de-pad in the
  same global order without depending on device placement.
  """
  if n_valid is None:
    n_valid = len(next(iter(batch.values())))
  assert n_valid > 0, 'empty per-host batch'
  pc = jax.process_count()
  assert mesh.devices.size % pc == 0, (mesh.devices.size, pc)
  local_n = mesh.devices.size // pc
  pad = -n_valid % local_n
  if pad:
    # Wrap-around row indices: pad may EXCEED n_valid (a trailing chunk
    # smaller than the device count), so simple v[:pad] tiling under-pads.
    idx = np.arange(n_valid + pad) % n_valid
    batch = {k: np.asarray(v)[idx] for k, v in batch.items()}
  batch = dict(batch, mask=np.arange(n_valid + pad) < n_valid)
  return shard_batch(mesh, batch)


def local_batch_size(global_batch: int,
                     process_count: Optional[int] = None) -> int:
  pc = process_count if process_count is not None else jax.process_count()
  if global_batch % pc != 0:
    raise ValueError(f'global batch {global_batch} not divisible by '
                     f'process count {pc}')
  return global_batch // pc
