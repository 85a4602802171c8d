"""Reference-checkpoint compatibility: import s-sahoo/MuLAN checkpoints.

The reference trains with clu checkpoints (reference experiment.py:211,
292-294): each `ckpt-N` has a sibling `ckpt-N.flax` file holding
`flax.serialization.to_bytes(TrainState)` — a msgpack dict with keys
{step, params, ema_params, opt_state} (reference train_state.py:33-119,
clu/checkpoint.py `save`). The released CIFAR-10 (ckpt-223, mulan_velocity)
and ImageNet32 (ckpt-220, mulan_epsilon) checkpoints are in this format.

This module converts that format into this framework's layout:

  * `convert_params` maps the reference parameter tree onto this framework's
    module names (GroupNorm wrappers, flattened-token attention projections,
    encoder trunk/head split). The mapping is pure re-indexing — verified
    elementwise against the live reference in tests/test_reference_parity.py
    (forward) and tests/test_grad_parity.py (gradients).
  * `load_reference_state` reads a `ckpt-N[.flax]` file (or the latest in a
    directory) without needing clu/TF.
  * the CLI imports a reference checkpoint into an orbax checkpoint that
    `--mode eval`, `eval_bpd.py` and training auto-resume consume directly:

      python -m mulan_tpu.compat \
          --config=mulan_tpu/configs/cifar10_conditioned.py \
          --reference_checkpoint=/ckpts/cifar10/checkpoints/ckpt-223 \
          --workdir=/tmp/imported

    The optimizer state is freshly initialized (the reference's optax
    tree layout follows its param layout and adam moments are cheap to
    re-accumulate); params, ema_params and step are imported.
  * `export_params` / `export_reference_checkpoint` go the OTHER way: a
    checkpoint trained here exports to a `ckpt-N.flax` the reference's eval
    harness and warm-start consume directly (restore_dict ->
    state_dict['ema_params'], notebook_utils.py:31-39):

      python -m mulan_tpu.compat --mode export \
          --checkpoint=<workdir>/checkpoints --output=/ckpts/export
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

from absl import logging
import flax
import jax
import numpy as np


# --------------------------------------------------------------------------
# Parameter-tree conversion (reference layout -> mulan_tpu layout)
# --------------------------------------------------------------------------


def _convert_attn(ref_attn: Dict[str, Any]) -> Dict[str, Any]:
  """Reference AttnBlock (model_vdm.py:660-701) uses Dense projections over
  the channel axis; our AttnBlock uses DenseGeneral with explicit
  (heads, head_dim) axes — same weights, reshaped."""
  c = ref_attn['q']['kernel'].shape[0]
  out = {'GroupNormF32_0': {'GroupNorm_0': ref_attn['GroupNorm_0']}}
  for name in ('q', 'k', 'v'):
    out[name] = {'kernel': ref_attn[name]['kernel'].reshape(c, 1, c),
                 'bias': ref_attn[name]['bias'].reshape(1, c)}
  out['proj_out'] = {
      'kernel': ref_attn['proj_out']['kernel'].reshape(1, c, c),
      'bias': ref_attn['proj_out']['bias']}
  return out


def _convert_block(ref_block: Dict[str, Any]) -> Dict[str, Any]:
  """ResnetBlock: our GroupNorms live inside GroupNormF32 wrapper modules."""
  out = {}
  for name, sub in ref_block.items():
    if name == 'GroupNorm_0':
      out['GroupNormF32_0'] = {'GroupNorm_0': sub}
    elif name == 'GroupNorm_1':
      out['GroupNormF32_1'] = {'GroupNorm_0': sub}
    else:
      out[name] = sub
  return out


def _convert_unet(ref: Dict[str, Any]) -> Dict[str, Any]:
  """ScoreUNet / UnetEncoder trunk: rename `a.b` modules to `a_b`, convert
  attention and resnet blocks, wrap the final GroupNorm."""
  out = {}
  for name, sub in ref.items():
    new = name.replace('.', '_')
    if 'attn' in name:
      out[new] = _convert_attn(sub)
    elif 'block' in name:
      out[new] = _convert_block(sub)
    elif name == 'GroupNorm_0':
      out['GroupNormF32_0'] = {'GroupNorm_0': sub}
    else:
      out[new] = sub
  return out


# Reference CNN encoder (model_mulan_epsilon.py:87-89) upper-cases its
# module names; ours are lower-case.
_CNN_IMPORT = {'CONV1': 'conv1', 'CONV2': 'conv2', 'DENSE': 'dense'}
_CNN_EXPORT = {v: k for k, v in _CNN_IMPORT.items()}


def convert_params(ref_params: Dict[str, Any]) -> Dict[str, Any]:
  """Reference param tree -> this framework's layout.

  Covers the module set of both released checkpoints (ScoreUNet score model,
  UnetEncoder encoder, any GAMMA_NETWORKS schedule; the epsilon and velocity
  models share all module classes, model_mulan_velocity.py:34-46), plus the
  CNN and Gaussian (`dense_layer_final_mu/sigma` heads) encoder variants.
  """
  ref = flax.core.unfreeze(ref_params)
  unknown = set(ref) - {'score_model', 'encoder_model', 'gamma'}
  if unknown:
    raise ValueError(f'unexpected top-level reference keys: {sorted(unknown)}')
  out = {'score_model': _convert_unet(ref['score_model'])}
  if 'encoder_model' in ref:
    encoder = _convert_unet(dict(ref['encoder_model']))
    heads = {k: encoder.pop(k) for k in sorted(encoder)
             if k.startswith('dense_layer_final')}
    if heads:  # UnetEncoder[Gaussian]: trunk + logits/mu/sigma head(s)
      out['encoder_model'] = {'trunk': encoder, **heads}
    else:  # CNN encoder: flat module list, names case-mapped
      out['encoder_model'] = {_CNN_IMPORT.get(k, k): v
                              for k, v in encoder.items()}
  if 'gamma' in ref:
    out['gamma'] = ref['gamma']
  return out


# --------------------------------------------------------------------------
# Export (this framework's layout -> reference layout)
# --------------------------------------------------------------------------

# Only the reference's down./mid./up. UNet module names contain dots
# (model_vdm.py:354-371); the import rename `.` -> `_` is invertible
# through this pattern.
_DOTTED_RE = re.compile(r'^(down|mid|up)_((?:block|attn)_\d+)$')


def _export_attn(attn: Dict[str, Any]) -> Dict[str, Any]:
  """Inverse of `_convert_attn`: (c, 1, c) DenseGeneral projections back to
  the reference's flat (c, c) Dense kernels."""
  c = np.shape(attn['q']['kernel'])[0]
  out = {'GroupNorm_0': attn['GroupNormF32_0']['GroupNorm_0']}
  for name in ('q', 'k', 'v'):
    out[name] = {'kernel': np.asarray(attn[name]['kernel']).reshape(c, c),
                 'bias': np.asarray(attn[name]['bias']).reshape(c)}
  out['proj_out'] = {
      'kernel': np.asarray(attn['proj_out']['kernel']).reshape(c, c),
      'bias': np.asarray(attn['proj_out']['bias'])}
  return out


def _export_block(block: Dict[str, Any]) -> Dict[str, Any]:
  out = {}
  for name, sub in block.items():
    if name == 'GroupNormF32_0':
      out['GroupNorm_0'] = sub['GroupNorm_0']
    elif name == 'GroupNormF32_1':
      out['GroupNorm_1'] = sub['GroupNorm_0']
    else:
      out[name] = sub
  return out


def _export_unet(tree: Dict[str, Any]) -> Dict[str, Any]:
  out = {}
  for name, sub in tree.items():
    m = _DOTTED_RE.match(name)
    new = f'{m.group(1)}.{m.group(2)}' if m else name
    if 'attn' in name:
      out[new] = _export_attn(sub)
    elif 'block' in name:
      out[new] = _export_block(sub)
    elif name == 'GroupNormF32_0':
      out['GroupNorm_0'] = sub['GroupNorm_0']
    else:
      out[new] = sub
  return out


def export_params(params: Dict[str, Any]) -> Dict[str, Any]:
  """This framework's param tree -> the reference layout. Exact inverse of
  `convert_params` (roundtrip-tested leaf-identical both ways)."""
  tree = flax.serialization.to_state_dict(flax.core.unfreeze(params))
  unknown = set(tree) - {'score_model', 'encoder_model', 'gamma'}
  if unknown:
    raise ValueError(f'unexpected top-level param keys: {sorted(unknown)}')
  out = {'score_model': _export_unet(tree['score_model'])}
  if 'encoder_model' in tree:
    encoder = dict(tree['encoder_model'])
    if 'trunk' in encoder:  # UnetEncoder[Gaussian]: re-flatten trunk + heads
      flat = _export_unet(encoder.pop('trunk'))
      flat.update(encoder)
      out['encoder_model'] = flat
    else:  # CNN encoder
      out['encoder_model'] = {_CNN_EXPORT.get(k, k): v
                              for k, v in encoder.items()}
  if 'gamma' in tree:
    out['gamma'] = tree['gamma']
  return out


def _write_tf_sidecars(output_dir: str, number: int) -> bool:
  """Write the TF-side checkpoint files clu.checkpoint needs next to
  `ckpt-N.flax`: the `checkpoint` state proto (latest-checkpoint
  resolution) and `ckpt-N.index`/`.data-*` (tf_checkpoint.restore()).

  The reference's consumers load via `clu.checkpoint.Checkpoint` — an empty
  `tf.train.Checkpoint()` plus the flax sidecar — so a trivial tf.train
  checkpoint saved under the same `ckpt-N` prefix is exactly what its
  `restore()`/`restore_dict()` path expects. Returns False (bare-.flax
  export, load_reference_state still reads it) if tensorflow is absent.
  """
  try:
    import tensorflow as tf  # gated: TF is optional in this framework
  except (ImportError, ModuleNotFoundError):
    logging.warning('tensorflow unavailable: exporting ckpt-%d.flax without '
                    'the TF sidecar files; clu.checkpoint.Checkpoint '
                    'restores need them (load_reference_state does not).',
                    number)
    return False
  ckpt = tf.train.Checkpoint()
  mngr = tf.train.CheckpointManager(ckpt, output_dir, max_to_keep=None,
                                    checkpoint_name='ckpt')
  mngr.save(checkpoint_number=number)
  # clu derives its next save number from save_counter; align it with N so
  # a post-restore clu .save() continues at ckpt-(N+1) instead of ckpt-1.
  ckpt.save_counter.assign(number)
  mngr.save(checkpoint_number=number)  # rewrite: embed the aligned counter
  return True


def export_reference_checkpoint(checkpoint_dir: str, output_dir: str,
                                step: Optional[int] = None) -> str:
  """Export an orbax checkpoint saved by this framework into the reference's
  on-disk format: `ckpt-N.flax` = msgpack of {step, params, ema_params},
  plus the TF sidecar files (`checkpoint` proto, `ckpt-N.index`/`.data-*`).

  The reference's stated consumers (notebook_utils.py:31-39 Experiment_Colab
  and experiment.py warm-start) load through
  `clu.checkpoint.Checkpoint.restore_dict`, which resolves the latest
  checkpoint via the TF `checkpoint` proto and calls tf_checkpoint.restore()
  on ckpt-N.index/.data — so those files are written too (verified by
  tests/test_export.py restoring through the REAL clu.checkpoint). The
  partial warm-start merges only present keys (experiment.py:377-392), so
  the missing `opt_state` is fine for eval and warm-start; full train
  auto-resume over there would re-init Adam moments. Returns the written
  .flax path.
  """
  from mulan_tpu.train import checkpoint as ckpt_lib

  mngr = ckpt_lib.CheckpointManager(checkpoint_dir)
  if step is None:
    step = mngr.latest_step()
  if step is None:
    raise FileNotFoundError(f'no checkpoints under {checkpoint_dir}')
  restored = mngr.restore_dict(step)
  state = {'step': np.int64(restored.get('step', step)),
           'params': export_params(restored['params']),
           'ema_params': export_params(restored['ema_params'])}
  os.makedirs(output_dir, exist_ok=True)
  path = os.path.join(output_dir, f'ckpt-{step}.flax')
  with open(path, 'wb') as f:
    f.write(flax.serialization.to_bytes(state))
  _write_tf_sidecars(output_dir, step)
  logging.info('exported step %d to reference format: %s', step, path)
  return path


def assert_tree_compatible(converted: Dict[str, Any], fresh: Dict[str, Any]):
  """Raise with a readable diff if the converted tree does not line up with a
  freshly initialized parameter tree of the target model."""
  conv_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                jax.tree_util.tree_leaves_with_path(converted)}
  fresh_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                 jax.tree_util.tree_leaves_with_path(fresh)}
  missing = sorted(set(fresh_paths) - set(conv_paths))
  extra = sorted(set(conv_paths) - set(fresh_paths))
  mismatched = sorted(k for k in set(conv_paths) & set(fresh_paths)
                      if conv_paths[k] != fresh_paths[k])
  if missing or extra or mismatched:
    lines = []
    if missing:
      lines.append(f'missing from checkpoint: {missing[:8]}')
    if extra:
      lines.append(f'unconsumed checkpoint leaves: {extra[:8]}')
    if mismatched:
      lines.append('shape mismatches: ' + ', '.join(
          f'{k}: ckpt{conv_paths[k]} vs model{fresh_paths[k]}'
          for k in mismatched[:8]))
    raise ValueError('reference checkpoint does not match the configured '
                     'model:\n  ' + '\n  '.join(lines))


# --------------------------------------------------------------------------
# Reference checkpoint IO
# --------------------------------------------------------------------------

_CKPT_RE = re.compile(r'^ckpt-(\d+)\.flax$')


def _resolve_flax_path(path: str) -> str:
  """Accept .../ckpt-N, .../ckpt-N.flax, or a directory (latest N wins)."""
  if os.path.isdir(path):
    best = None
    for name in os.listdir(path):
      m = _CKPT_RE.match(name)
      if m:
        n = int(m.group(1))
        if best is None or n > best[0]:
          best = (n, os.path.join(path, name))
    if best is None:
      raise FileNotFoundError(f'no ckpt-N.flax files under {path}')
    return best[1]
  if path.endswith('.flax'):
    return path
  return path + '.flax'


def load_reference_state(path: str) -> Dict[str, Any]:
  """Load a reference `ckpt-N` into a plain nested dict
  {step, params, ema_params, opt_state} (keys as saved)."""
  flax_path = _resolve_flax_path(path)
  with open(flax_path, 'rb') as f:
    state = flax.serialization.msgpack_restore(f.read())
  logging.info('loaded reference checkpoint %s (keys: %s)', flax_path,
               sorted(state))
  return state


def reference_step_number(path: str) -> Optional[int]:
  m = re.search(r'ckpt-(\d+)(?:\.flax)?$', path)
  return int(m.group(1)) if m else None


# --------------------------------------------------------------------------
# Importer
# --------------------------------------------------------------------------


def import_into_state(state, ref_state: Dict[str, Any], step: int):
  """Return a copy of TrainState `state` holding the reference checkpoint's
  params + ema_params (converted) and the given step; optimizer state stays
  freshly initialized."""
  import jax.numpy as jnp

  fresh = flax.serialization.to_state_dict(state.params)
  params = convert_params(ref_state['params'])
  assert_tree_compatible(params, fresh)
  ema = convert_params(ref_state.get('ema_params', ref_state['params']))
  as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
  params = flax.serialization.from_state_dict(state.params, params)
  ema = flax.serialization.from_state_dict(state.ema_params, ema)
  return state.replace(step=jnp.asarray(step, jnp.int32),
                       params=as_jnp(params), ema_params=as_jnp(ema))


def import_reference_checkpoint(config, reference_checkpoint: str,
                                workdir: str) -> int:
  """Import a reference checkpoint into `workdir/checkpoints` (orbax).

  Returns the imported step number. The resulting checkpoint is what the
  train loop auto-resumes from and what `--mode eval` / eval_bpd read.
  """
  from mulan_tpu.models import build_model, model_config_from_dict
  from mulan_tpu.train import checkpoint as ckpt_lib
  from mulan_tpu.train.optimizer import make_lr_schedule, make_optimizer
  from mulan_tpu.train.state import TrainState
  import jax.numpy as jnp

  model_config = model_config_from_dict(dict(config.model))
  model = build_model(config.vdm_type, model_config)
  rng = jax.random.PRNGKey(0)
  init_fn = jax.jit(lambda r1, r2: model.init(
      {'params': r1, 'sample': r2},
      images=jnp.zeros((2, *model_config.image_shape), 'uint8'),
      labels=jnp.zeros((2,), 'int32'), conditioning=jnp.zeros((2,)),
      step=-1.0))
  params = init_fn(rng, jax.random.fold_in(rng, 1))['params']

  lr_schedule = make_lr_schedule(
      config.optimizer.learning_rate, config.training.num_steps_lr_warmup,
      config.training.num_steps_train, config.optimizer.lr_decay)
  tx = make_optimizer(dict(config.optimizer), lr_schedule,
                      gamma_lr_scale=config.get('lr_gamma_network_scale',
                                                1.0))
  state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

  ref_state = load_reference_state(reference_checkpoint)
  step = int(np.asarray(ref_state.get('step', 0)))
  if step == 0:
    step = reference_step_number(reference_checkpoint) or 0
  state = import_into_state(state, ref_state, step)

  ckpt = ckpt_lib.CheckpointManager(os.path.join(workdir, 'checkpoints'))
  ckpt.save(step, jax.device_get(state), force=True)
  ckpt.wait()
  logging.info('imported reference checkpoint at step %d into %s', step,
               workdir)
  return step


def main(argv):
  del argv
  from absl import flags
  FLAGS = flags.FLAGS
  if FLAGS.mode == 'import':
    if not (FLAGS.config and FLAGS.reference_checkpoint and FLAGS.workdir):
      raise ValueError('--mode import needs --config, '
                       '--reference_checkpoint and --workdir')
    import_reference_checkpoint(FLAGS.config, FLAGS.reference_checkpoint,
                                FLAGS.workdir)
  elif FLAGS.mode == 'export':
    if not (FLAGS.checkpoint and FLAGS.output):
      raise ValueError('--mode export needs --checkpoint and --output')
    path = export_reference_checkpoint(FLAGS.checkpoint, FLAGS.output)
    print(f'Wrote {path}')
  else:
    raise ValueError(f'unknown --mode: {FLAGS.mode!r}')


if __name__ == '__main__':
  from absl import app, flags
  from ml_collections import config_flags
  config_flags.DEFINE_config_file('config', None, 'Model configuration '
                                  '(--mode import).', lock_config=False)
  flags.DEFINE_string('mode', 'import', 'import: reference ckpt-N -> orbax; '
                      'export: orbax -> reference ckpt-N.flax.')
  flags.DEFINE_string('reference_checkpoint', None,
                      'Path to a reference ckpt-N[.flax] file or its '
                      'directory (latest wins).')
  flags.DEFINE_string('workdir', None,
                      'Output work directory (--mode import).')
  flags.DEFINE_string('checkpoint', None,
                      'Orbax checkpoints dir to export (--mode export).')
  flags.DEFINE_string('output', None,
                      'Output dir for ckpt-N.flax (--mode export).')
  app.run(main)
