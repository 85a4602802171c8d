"""Reference-checkpoint importer tests (mulan_tpu/compat.py).

Builds a checkpoint in the reference's exact on-disk format — `ckpt-N.flax`
holding flax.serialization.to_bytes({step, params, ema_params, opt_state})
(clu/checkpoint.py `save`, reference experiment.py:292-294) — imports it with
the compat CLI path, and verifies the orbax checkpoint our eval stack reads
holds the transplanted parameters. Skipped without /root/reference (the
source params come from the live reference model so the test also covers the
layout conversion end-to-end).
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


def _config():
  from mulan_tpu.configs import tiny_synthetic
  config = tiny_synthetic.get_config()
  config.vdm_type = 'mulan_epsilon'
  for key, value in CFG_KW.items():
    config.model[key] = value
  config.model.image_size = 32
  return config


@pytest.fixture(scope='module')
def reference_ckpt_dir(tmp_path_factory):
  """A checkpoints/ dir in the reference's clu format, from the LIVE
  reference model's params."""
  sys.path.insert(0, REFERENCE)
  from ldm import model_mulan_epsilon, model_vdm
  cfg = model_vdm.VDMConfig(sample_softmax=False, **CFG_KW)
  model = model_mulan_epsilon.VDM(cfg)
  r = jax.random.PRNGKey(0)
  variables = model.init(
      {'params': r, 'sample': jax.random.fold_in(r, 1)},
      images=jnp.zeros((2, 32, 32, 3), 'uint8'),
      labels=jnp.zeros((2,)), conditioning=jnp.zeros((2,)), step=-1.0)
  params = flax.core.unfreeze(variables['params'])
  # distinct ema so the test can tell the two trees apart
  ema = jax.tree.map(lambda x: x * 0.5, params)
  state = {'step': np.int64(2230000), 'params': params, 'ema_params': ema,
           'opt_state': {}}
  ckpt_dir = tmp_path_factory.mktemp('ref_ckpts')
  for num in (7, 223):  # two checkpoints: latest must win
    with open(ckpt_dir / f'ckpt-{num}.flax', 'wb') as f:
      f.write(flax.serialization.to_bytes(state))
  return str(ckpt_dir), params, ema


def test_load_reference_state_resolves_paths(reference_ckpt_dir):
  from mulan_tpu import compat
  ckpt_dir, params, _ = reference_ckpt_dir
  for path in (ckpt_dir,                                 # dir -> latest
               os.path.join(ckpt_dir, 'ckpt-223'),       # clu-style name
               os.path.join(ckpt_dir, 'ckpt-223.flax')):  # explicit file
    state = compat.load_reference_state(path)
    assert set(state) == {'step', 'params', 'ema_params', 'opt_state'}
    assert int(state['step']) == 2230000
  assert compat.reference_step_number('/x/ckpt-223') == 223
  assert compat.reference_step_number('/x/ckpt-220.flax') == 220
  assert compat.reference_step_number('/x/other') is None


def test_import_roundtrip(reference_ckpt_dir, tmp_path):
  """Import a reference checkpoint, then read it back through OUR checkpoint
  manager exactly as `--mode eval` does."""
  from mulan_tpu import compat
  from mulan_tpu.train import checkpoint as ckpt_lib
  ckpt_dir, ref_params, ref_ema = reference_ckpt_dir
  config = _config()
  workdir = str(tmp_path / 'imported')

  step = compat.import_reference_checkpoint(
      config, os.path.join(ckpt_dir, 'ckpt-223'), workdir)
  assert step == 2230000

  mngr = ckpt_lib.CheckpointManager(os.path.join(workdir, 'checkpoints'))
  restored = mngr.restore_dict()
  assert int(np.asarray(restored['step'])) == 2230000

  expected_params = compat.convert_params(ref_params)
  expected_ema = compat.convert_params(ref_ema)
  for got_tree, want_tree in ((restored['params'], expected_params),
                              (restored['ema_params'], expected_ema)):
    got = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(got_tree)}
    want = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(want_tree)}
    assert set(got) == set(want)
    for name in want:
      np.testing.assert_array_equal(np.asarray(got[name]),
                                    np.asarray(want[name]), err_msg=name)


def test_import_rejects_mismatched_model(reference_ckpt_dir, tmp_path):
  from mulan_tpu import compat
  ckpt_dir, _, _ = reference_ckpt_dir
  config = _config()
  config.model.sm_n_embd = 64  # wrong width
  with pytest.raises(ValueError, match='does not match'):
    compat.import_reference_checkpoint(
        config, os.path.join(ckpt_dir, 'ckpt-223'), str(tmp_path / 'w'))
