"""Scalar-VDM reparam_type parity ('noise' vs 'input') vs the live reference.

The reference's baseline VDM carries an output-parameterization switch
(/root/reference/ldm/model_vdm.py): with `reparam_type='input'` the score
model's output is interpreted as x-hat — the discrete-time diffusion loss
weighting becomes `0.5*T*exp(-g_t)*expm1(g_t-g_s)*mse` (model_vdm.py:167-168)
and the ancestral sampler converts x-hat -> eps-hat before the update step
(model_vdm.py:197-201). These tests transplant reference-initialized
parameters and assert ELBO terms and one ancestral step agree elementwise for
BOTH reparam types under frozen randomness.

Skipped when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parity_helpers import frozen_randomness

T_DISCRETE = 10



CFG_KW = dict(
    vocab_size=256, antithetic_time_sampling=True,
    with_fourier_features=True, with_attention=False,
    gamma_type='learnable_scalar', gamma_min=-13.3, gamma_max=5.0,
    sm_n_timesteps=T_DISCRETE, sm_n_embd=32, sm_n_layer=1, sm_pdrop=0.1,
    condition='input', unet_type='vdm')


def _build(reparam_type: str):
  sys.path.insert(0, REFERENCE)
  from ldm import model_vdm
  from mulan_tpu.compat import convert_params
  from mulan_tpu.models import build_model
  from mulan_tpu.models.config import ModelConfig

  ref_cfg = model_vdm.VDMConfig(sample_softmax=False,
                                reparam_type=reparam_type, **CFG_KW)
  ref_model = model_vdm.VDM(ref_cfg)
  r = jax.random.PRNGKey(0)
  ref_vars = ref_model.init(
      {'params': r, 'sample': jax.random.fold_in(r, 1)},
      images=jnp.zeros((2, 32, 32, 3), 'uint8'),
      labels=jnp.zeros((2,)), conditioning=jnp.zeros((2,)), step=-1.0)

  ours = build_model('vdm', ModelConfig(sample_softmax=False, image_size=32,
                                        reparam_type=reparam_type, **CFG_KW))
  params = convert_params(ref_vars['params'])
  return ref_model, dict(ref_vars['params']), ours, params


@pytest.mark.parametrize('reparam_type', ['noise', 'input'])
def test_discrete_elbo_terms_match_reference(monkeypatch, reparam_type):
  ref_model, ref_params, ours, params = _build(reparam_type)
  frozen_randomness(monkeypatch)

  batch = 4
  rs = np.random.RandomState(17)
  images = jnp.asarray(rs.randint(0, 256, (batch, 32, 32, 3)), 'uint8')
  labels = jnp.zeros((batch,), 'int32')
  conditioning = jnp.zeros((batch,))
  rngs = {'sample': jax.random.PRNGKey(123)}  # consumed by patched draws
  # the exact discretized antithetic grid the reference computes with the
  # patched uniform (t0=0.375): t = ceil(t*T)/T
  t = jnp.mod(0.375 + jnp.arange(0.0, 1.0, step=1.0 / batch), 1.0)
  t = jnp.ceil(t * T_DISCRETE) / T_DISCRETE

  out_ref = ref_model.apply({'params': ref_params}, images=images,
                            labels=labels, conditioning=conditioning,
                            step=100.0, deterministic=True, rngs=rngs)
  out_ours = ours.apply({'params': params}, images=images, labels=labels,
                        conditioning=conditioning, step=100.0, t=t,
                        deterministic=True, rngs=rngs, method=ours.elbo)
  for term in ('loss_recon', 'loss_klz', 'loss_diff'):
    np.testing.assert_allclose(
        np.asarray(getattr(out_ours, term)),
        np.asarray(getattr(out_ref, term)),
        rtol=1e-5, atol=1e-5, err_msg=f'{term} ({reparam_type})')


def test_input_weighting_differs_from_noise(monkeypatch):
  """Guard against the branch silently collapsing: the 'input' discrete
  weighting exp(-g_t) must CHANGE loss_diff vs 'noise' on identical params
  and randomness."""
  _, _, ours_noise, params = _build('noise')
  _, _, ours_input, _ = _build('input')
  frozen_randomness(monkeypatch)
  batch = 4
  rs = np.random.RandomState(17)
  images = jnp.asarray(rs.randint(0, 256, (batch, 32, 32, 3)), 'uint8')
  kw = dict(images=images, labels=jnp.zeros((batch,), 'int32'),
            conditioning=jnp.zeros((batch,)), step=100.0,
            t=jnp.full((batch,), 0.5), deterministic=True,
            rngs={'sample': jax.random.PRNGKey(1)})
  out_n = ours_noise.apply({'params': params}, **kw, method=ours_noise.elbo)
  out_i = ours_input.apply({'params': params}, **kw, method=ours_input.elbo)
  assert not np.allclose(np.asarray(out_n.loss_diff),
                         np.asarray(out_i.loss_diff))
  np.testing.assert_allclose(np.asarray(out_n.loss_recon),
                             np.asarray(out_i.loss_recon))


@pytest.mark.parametrize('reparam_type', ['noise', 'input'])
def test_ancestral_step_matches_reference(monkeypatch, reparam_type):
  """One ancestral step incl. the 'input' x-hat -> eps-hat conversion
  (model_vdm.py:191-209)."""
  ref_model, ref_params, ours, params = _build(reparam_type)
  frozen_randomness(monkeypatch)

  batch = 2
  z_t = jnp.asarray(np.random.RandomState(3).standard_normal(
      (batch, 32, 32, 3)), jnp.float32)
  conditioning = jnp.zeros((batch,))
  rng = jax.random.PRNGKey(7)
  for i in (0, 500, 999):
    z_ref = ref_model.apply({'params': ref_params}, i, 1000, z_t,
                            conditioning, rng, method=ref_model.sample)
    z_ours = ours.apply({'params': params}, i, 1000, z_t, conditioning, rng,
                        method=ours.sample)
    np.testing.assert_allclose(np.asarray(z_ours), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5,
                               err_msg=f'step {i} ({reparam_type})')
