"""Device mesh and sharding policy.

The reference scales with `jax.pmap('batch')` + `flax_utils.replicate`
(/root/reference/ldm/experiment.py:89-102, 218) — per-device leading axes,
host-side unreplicate, NCCL collectives. The TPU-native replacement is a
1-D (extensible to 3-D data x fsdp x tensor) `jax.sharding.Mesh` over all
chips with `jit` + `NamedSharding`:

  * params / EMA / optimizer state: fully replicated on the 1-D mesh;
    sharded over 'fsdp' (ZeRO-3) and/or 'tensor' (column-parallel output
    features) on the larger meshes,
  * batches: sharded along 'data' (and 'fsdp'), replicated over 'tensor',
  * gradients: XLA inserts the psum/reduce-scatter over ICI automatically
    when the loss is a mean over the sharded batch axis.

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
TENSOR_AXIS = 'tensor'


def create_mesh(devices=None, fsdp: int = 1, tp: int = 1) -> Mesh:
  """Device mesh: 1-D ('data',), or up to 3-D ('data', 'fsdp', 'tensor').

  Batches shard over 'data' AND 'fsdp' (every chip in those submeshes holds
  a batch shard) but are REPLICATED over 'tensor'. Parameters/EMA/optimizer
  state shard over 'fsdp' (ZeRO-3-style) and, with tp > 1, additionally over
  'tensor' on their output-feature axis (Megatron-style column parallelism —
  each tensor group computes a channel slice of every conv/dense; XLA/GSPMD
  inserts the contraction all-reduces and the grad reduce-scatters).
  fsdp=tp=1 reproduces pure DP — the reference's only strategy (SURVEY
  section 2.7).
  """
  if devices is None:
    devices = jax.devices()
  devices = np.asarray(devices)
  assert len(devices) % (fsdp * tp) == 0, (len(devices), fsdp, tp)
  shape = [len(devices) // (fsdp * tp)]
  names = [DATA_AXIS]
  if fsdp > 1:
    shape.append(fsdp)
    names.append(FSDP_AXIS)
  if tp > 1:
    shape.append(tp)
    names.append(TENSOR_AXIS)
  if len(names) == 1:
    return Mesh(devices, (DATA_AXIS,))
  return Mesh(devices.reshape(shape), tuple(names))


def _batch_axes(mesh: Mesh):
  """Batches shard over data and fsdp; tensor groups see the full batch."""
  return tuple(a for a in mesh.axis_names if a != TENSOR_AXIS)


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
  """Shard the given array axis over the batch mesh axes (data, fsdp)."""
  spec = [None] * (batch_axis + 1)
  spec[batch_axis] = _batch_axes(mesh)
  return NamedSharding(mesh, P(*spec))


def param_sharding(mesh: Mesh, shape) -> NamedSharding:
  """Parameter sharding policy for one leaf.

  With a 'tensor' axis, the LAST array axis (output features: Cout of a conv
  kernel, out-dim of a dense kernel, the feature dim of biases/norm scales)
  shards over 'tensor' when divisible — the column-parallel convention, so
  activations come out channel-sharded and GSPMD propagates the layout
  forward. With an 'fsdp' axis, the largest REMAINING axis divisible by the
  fsdp size shards over 'fsdp'. Leaves with no divisible axis (and all
  leaves on a 1-D mesh) stay replicated.
  """
  spec = [None] * len(shape)
  if shape:
    if TENSOR_AXIS in mesh.axis_names and shape[-1] % mesh.shape[
        TENSOR_AXIS] == 0:
      spec[-1] = TENSOR_AXIS
    if FSDP_AXIS in mesh.axis_names:
      size = mesh.shape[FSDP_AXIS]
      candidates = [(dim, i) for i, dim in enumerate(shape)
                    if spec[i] is None and dim % size == 0]
      if candidates:
        _, axis = max(candidates)
        spec[axis] = FSDP_AXIS
  if not any(spec):
    return NamedSharding(mesh, P())
  return NamedSharding(mesh, P(*spec))


# Back-compat name (round 2/3 callers/tests): the 2-D data x fsdp policy is
# the tp=1 special case of param_sharding.
fsdp_sharding = param_sharding


# --------------------------------------------------------------------------
# Tensor-parallel activation pinning
# --------------------------------------------------------------------------
#
# Column-parallel parameter placement alone leaves GSPMD free to re-replicate
# activations between layers (all-gather after every conv), silently
# degenerating tp>1 to replicated compute. The UNet calls
# `constrain_activation_channels(h, self.tensor_mesh)` on every block output;
# with a mesh carrying a 'tensor' axis that inserts a with_sharding_constraint
# pinning the channel (last) axis to 'tensor', so the channel-sharded layout
# survives the whole UNet. With mesh=None (the default for every builder
# outside Experiment) or a mesh without a 'tensor' axis it is an identity.
#
# The mesh rides as a per-model flax attribute (build_model(..., tensor_mesh=)
# -> UNet.tensor_mesh), NOT process-global state: each Experiment's lazily
# traced jits (train scan, eval, sampler fori_loop) close over their own
# model instance, so constructing several Experiments on different meshes in
# one process cannot clobber each other's constraints at trace time.


def tensor_mesh_or_none(mesh: Optional[Mesh]) -> Optional[Mesh]:
  """The mesh if it has a 'tensor' axis, else None (identity constraints)."""
  if mesh is not None and TENSOR_AXIS in mesh.axis_names:
    return mesh
  return None


def constrain_activation_channels(x, mesh: Optional[Mesh]):
  """Pin the last (channel/feature) axis of an activation to 'tensor'."""
  if mesh is None or TENSOR_AXIS not in mesh.axis_names:
    return x
  tp = mesh.shape[TENSOR_AXIS]
  if x.ndim == 0 or x.shape[-1] % tp != 0:
    return x
  spec = P(*((None,) * (x.ndim - 1)), TENSOR_AXIS)
  return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


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
  return param_sharding(mesh, jnp_shape(x))


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
