"""Orbax-backed checkpointing with the reference's restore semantics.

Replaces clu.checkpoint.MultihostCheckpoint (/root/reference/ldm/
experiment.py:209-214, 292-294) with orbax CheckpointManager. Checkpoints are
keyed by the actual training step (the reference keys by save-count; both are
monotone, eval CLIs scan for the latest either way). Three restore paths are
preserved:
  1. auto-resume: restore latest into a same-shaped TrainState;
  2. partial warm-start: merge only the keys present in the saved dict
     (reference copy_dict, experiment.py:377-392) — see
     `restore_partial_into`;
  3. eval: read `ema_params` only.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from absl import logging
import flax
import jax
import orbax.checkpoint as ocp


def _to_pure_dict(tree) -> dict:
  return flax.serialization.to_state_dict(tree)


class CheckpointManager:

  def __init__(self, directory: str, max_to_keep: int = 100):
    self._dir = os.path.abspath(directory)
    self._mngr = ocp.CheckpointManager(
        self._dir,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, step_prefix='ckpt', create=True))

  def save(self, step: int, state, force: bool = False):
    self._mngr.save(step, args=ocp.args.StandardSave(_to_pure_dict(state)),
                    force=force)

  def wait(self):
    self._mngr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mngr.latest_step()

  def restore(self, state, step: Optional[int] = None):
    """Restore into a same-structure TrainState (auto-resume path)."""
    if step is None:
      step = self.latest_step()
    assert step is not None, f'no checkpoint found in {self._dir}'
    template = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                            _to_pure_dict(state))
    restored = self._mngr.restore(step,
                                  args=ocp.args.StandardRestore(template))
    return flax.serialization.from_state_dict(state, restored)

  def restore_dict(self, step: Optional[int] = None) -> dict:
    """Raw HOST (numpy) dict restore (eval / partial warm-start paths).

    Restores every leaf as numpy regardless of the mesh the checkpoint was
    saved on: an un-templated StandardRestore reconstructs the SAVED
    NamedShardings, which fails when the eval topology differs from the
    training mesh (e.g. an fsdp-sharded pod save evaluated on one chip).
    Callers re-place the tree (EvalExperiment device_puts the EMA params
    replicated; partial warm-start merges into a fresh host state)."""
    if step is None:
      step = self.latest_step()
    assert step is not None, f'no checkpoint found in {self._dir}'
    path = os.path.join(self._dir, f'ckpt_{step}', 'default')
    # The step directory layout is pinned by __init__'s step_prefix='ckpt';
    # fail loudly if orbax's on-disk naming ever drifts from it, rather than
    # silently taking the topology-bound fallback below.
    assert os.path.isdir(path), (
        f'checkpoint step dir missing: {path} (orbax layout drift?)')
    try:
      import numpy as np
      ckptr = ocp.PyTreeCheckpointer()
      meta_tree = ckptr.metadata(path).item_metadata.tree
      restore_args = jax.tree.map(
          lambda _: ocp.type_handlers.RestoreArgs(restore_type=np.ndarray),
          meta_tree)
      return ckptr.restore(
          path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    except (FileNotFoundError, ValueError, KeyError):
      # Non-pytree/legacy layout: the topology-bound path. Deliberately
      # NARROW — AttributeError/TypeError from orbax API drift must
      # propagate, or cross-topology restores would silently regress to
      # StandardRestore (which re-binds the SAVED mesh and crashes when the
      # eval topology differs from training).
      logging.warning('restore_dict: numpy restore failed for %s; falling '
                      'back to StandardRestore with saved shardings', path,
                      exc_info=True)
      return self._mngr.restore(step, args=ocp.args.StandardRestore())

  def close(self):
    self._mngr.close()


def restore_partial_into(state, restore_path: str) -> Any:
  """Warm-start from `restore_path`: either a directory of checkpoints
  (latest wins) or a specific `.../ckpt-N` entry. Only keys present in the
  saved dict are copied (reference experiment.py:71-84)."""
  from mulan_tpu.train.state import merge_restored

  step = None
  base = restore_path
  name = os.path.basename(restore_path.rstrip('/'))
  if name.startswith('ckpt-'):
    step = int(name.split('-', 1)[1])
    base = os.path.dirname(restore_path.rstrip('/'))
  mngr = CheckpointManager(base)
  restored = mngr.restore_dict(step)
  logging.info('partial warm-start from %s (step %s)', base, step)
  merged = merge_restored(_to_pure_dict(state), restored)
  return flax.serialization.from_state_dict(state, merged)
