"""Reference-checkpoint EXPORT tests (mulan_tpu/compat.py export path).

`export_params` must be the exact inverse of `convert_params`: a checkpoint
trained here, exported as `ckpt-N.flax`, is what the reference eval harness
reads (`restore_dict()['ema_params']`, reference notebook_utils.py:31-39).
Verified as a full cycle: the LIVE reference model's params -> import
(orbax) -> export (ckpt-N.flax) -> leaf-identical to the original, plus
layout roundtrips for every encoder variant (unet / gaussian / cnn).
Skipped without /root/reference.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')

import flax  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CFG_KW = dict(
    vocab_size=256, antithetic_time_sampling=True,
    with_fourier_features=True, with_attention=False,
    gamma_type='poly_fixedend', gamma_min=-13.3, gamma_max=5.0,
    sm_n_timesteps=0, sm_n_embd=32, sm_n_layer=2, sm_pdrop=0.1,
    forward_n_layer=1, latent_size=10, latent_k=3, latent_type='topk',
    topk_noise_type='gamma', z_conditioning=True, reparam_type='true',
    encoder='unet', condition='input', unet_type='vdm')


def _leaves(tree):
  return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
          jax.tree_util.tree_leaves_with_path(tree)}


def _assert_trees_equal(got, want):
  got, want = _leaves(got), _leaves(want)
  assert set(got) == set(want), (
      f'missing: {sorted(set(want) - set(got))[:6]} '
      f'extra: {sorted(set(got) - set(want))[:6]}')
  for name in want:
    np.testing.assert_array_equal(got[name], want[name], err_msg=name)


def _reference_params(**overrides):
  """Init the LIVE reference model and return its unfrozen param tree."""
  sys.path.insert(0, REFERENCE)
  from ldm import model_mulan_epsilon, model_vdm
  kw = dict(CFG_KW, **overrides)
  cfg = model_vdm.VDMConfig(sample_softmax=False, **kw)
  model = model_mulan_epsilon.VDM(cfg)
  r = jax.random.PRNGKey(0)
  variables = model.init(
      {'params': r, 'sample': jax.random.fold_in(r, 1)},
      images=jnp.zeros((2, 32, 32, 3), 'uint8'),
      labels=jnp.zeros((2,)), conditioning=jnp.zeros((2,)), step=-1.0)
  return flax.core.unfreeze(variables['params'])


def _our_config(**overrides):
  from mulan_tpu.configs import tiny_synthetic
  config = tiny_synthetic.get_config()
  config.vdm_type = 'mulan_epsilon'
  for key, value in dict(CFG_KW, **overrides).items():
    config.model[key] = value
  config.model.image_size = 32
  return config


@pytest.mark.parametrize('overrides', [
    {},                                            # UnetEncoder (released)
    {'with_attention': True},                      # attn blocks in both unets
    {'latent_type': 'gaussian'},                   # mu/sigma two-head encoder
    {'encoder': 'cnn'},                            # case-mapped CNN names
], ids=['unet', 'attn', 'gaussian', 'cnn'])
def test_export_inverts_import_on_reference_tree(overrides):
  """export_params(convert_params(ref)) == ref, names AND values, for every
  encoder variant the reference can build."""
  from mulan_tpu import compat
  ref = _reference_params(**overrides)
  converted = compat.convert_params(ref)
  _assert_trees_equal(compat.export_params(converted), ref)


def test_converted_gaussian_and_cnn_trees_match_our_models():
  """The gaussian/cnn conversions must line up with OUR fresh-init trees,
  not just roundtrip (guards against a symmetric-but-wrong mapping)."""
  from mulan_tpu import compat
  from mulan_tpu.models import build_model, model_config_from_dict
  for overrides in ({'latent_type': 'gaussian'}, {'encoder': 'cnn'}):
    ref = _reference_params(**overrides)
    config = _our_config(**overrides)
    model_config = model_config_from_dict(dict(config.model))
    model = build_model(config.vdm_type, model_config)
    r = jax.random.PRNGKey(0)
    fresh = model.init(
        {'params': r, 'sample': jax.random.fold_in(r, 1)},
        images=jnp.zeros((2, 32, 32, 3), 'uint8'),
        labels=jnp.zeros((2,), 'int32'), conditioning=jnp.zeros((2,)),
        step=-1.0)['params']
    converted = compat.convert_params(ref)
    compat.assert_tree_compatible(
        converted, flax.serialization.to_state_dict(fresh))


@pytest.fixture(scope='module')
def exported_cycle(tmp_path_factory):
  """reference ckpt-N.flax -> compat import (orbax) -> compat export; shared
  by the roundtrip and clu-restore tests."""
  from mulan_tpu import compat
  tmp_path = tmp_path_factory.mktemp('cycle')
  ref_params = _reference_params()
  ref_ema = jax.tree.map(lambda x: x * 0.5, ref_params)
  state = {'step': np.int64(2230000), 'params': ref_params,
           'ema_params': ref_ema, 'opt_state': {}}
  src = tmp_path / 'ref_ckpts'
  src.mkdir()
  with open(src / 'ckpt-223.flax', 'wb') as f:
    f.write(flax.serialization.to_bytes(state))

  workdir = str(tmp_path / 'imported')
  step = compat.import_reference_checkpoint(
      _our_config(), str(src / 'ckpt-223'), workdir)
  out = compat.export_reference_checkpoint(
      os.path.join(workdir, 'checkpoints'), str(tmp_path / 'export'))
  return out, step, ref_params, ref_ema


def test_full_cycle_reference_import_export(exported_cycle):
  """reference ckpt-N.flax -> compat import (orbax) -> compat export
  (ckpt-N.flax) -> leaf-identical params/ema/step to the original."""
  from mulan_tpu import compat
  out, step, ref_params, ref_ema = exported_cycle
  assert out.endswith(f'ckpt-{step}.flax')
  exported = compat.load_reference_state(out)
  assert int(np.asarray(exported['step'])) == 2230000
  _assert_trees_equal(exported['params'], ref_params)
  _assert_trees_equal(exported['ema_params'], ref_ema)


def test_exported_checkpoint_restores_through_clu(exported_cycle):
  """The reference's ACTUAL load path (notebook_utils.py:31-39 / warm-start):
  `clu.checkpoint.Checkpoint.restore_dict` resolves the latest checkpoint
  via the TF `checkpoint` proto and calls tf_checkpoint.restore() on
  ckpt-N.index/.data — the export must carry those sidecars, not just the
  bare .flax (round-3 ADVICE, severity high)."""
  clu_checkpoint = pytest.importorskip('clu.checkpoint')
  out, step, ref_params, ref_ema = exported_cycle
  out_dir = os.path.dirname(out)
  # the TF sidecars exist
  assert os.path.exists(os.path.join(out_dir, 'checkpoint'))
  assert os.path.exists(os.path.join(out_dir, f'ckpt-{step}.index'))
  # and the REAL clu restore path reads the export end-to-end
  ckpt = clu_checkpoint.Checkpoint(out_dir)
  assert ckpt.latest_checkpoint is not None
  assert ckpt.latest_checkpoint.endswith(f'ckpt-{step}')
  restored = ckpt.restore_dict()
  assert int(np.asarray(restored['step'])) == 2230000
  _assert_trees_equal(restored['params'], ref_params)
  _assert_trees_equal(restored['ema_params'], ref_ema)
