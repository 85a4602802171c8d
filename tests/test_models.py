"""End-to-end model tests: init, ELBO, sampling, ODE drift for every family."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu.models import build_model
from mulan_tpu.models.vdm import sample_times


def _init(model, rng, batch=2, size=8):
  images = jnp.zeros((batch, size, size, 3), 'uint8')
  labels = jnp.zeros((batch,))
  conditioning = jnp.zeros((batch,))
  r1, r2 = jax.random.split(rng)
  params = model.init({'params': r1, 'sample': r2}, images, labels,
                      conditioning, step=-1.0)
  return params, dict(images=images, labels=labels,
                      conditioning=conditioning)


def _elbo(model, params, inputs, rng, train=False):
  rngs = {'sample': rng}
  if train:
    rngs['dropout'] = jax.random.fold_in(rng, 7)
  return model.apply(params, **inputs, step=0.0, rngs=rngs,
                     deterministic=not train)


@pytest.mark.parametrize('vdm_type',
                         ['vdm', 'mulan_epsilon', 'mulan_velocity'])
def test_elbo_shapes_and_finiteness(vdm_type, tiny_config, rng):
  cfg = tiny_config
  if vdm_type == 'vdm':
    cfg = dataclasses.replace(cfg, gamma_type='learnable_nnet')
  model = build_model(vdm_type, cfg)
  params, inputs = _init(model, rng)
  out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1), train=True)
  for term in (out.loss_recon, out.loss_klz, out.loss_diff):
    assert term.shape == (2,)
    assert jnp.all(jnp.isfinite(term))
  assert jnp.isfinite(out.var_0) and jnp.isfinite(out.var_1)
  # at init gamma endpoints give tiny var_0 / large var_1
  assert float(out.var_0) < 0.01
  assert float(out.var_1) > 0.9


def test_mulan_discrete_time_branch(tiny_config, rng):
  cfg = dataclasses.replace(tiny_config, sm_n_timesteps=50)
  model = build_model('mulan_epsilon', cfg)
  params, inputs = _init(model, rng)
  out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1))
  assert jnp.all(jnp.isfinite(out.loss_diff))


def test_mulan_gaussian_and_gumbel_latents(tiny_config, rng):
  for latent_type in ('gaussian', 'gumbel'):
    cfg = dataclasses.replace(tiny_config, latent_type=latent_type)
    model = build_model('mulan_epsilon', cfg)
    params, inputs = _init(model, rng)
    out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1))
    assert jnp.all(jnp.isfinite(out.loss_klz))


def test_mulan_ldm_unet_variant(tiny_config, rng):
  """The per-pixel-gamma UNet path (unet_type='ldm')."""
  cfg = dataclasses.replace(tiny_config, unet_type='ldm')
  model = build_model('mulan_epsilon', cfg)
  params, inputs = _init(model, rng)
  out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1))
  assert jnp.all(jnp.isfinite(out.loss_diff))


def test_mulan_velocity_from_epsilon(tiny_config, rng):
  cfg = dataclasses.replace(tiny_config, velocity_from_epsilon=True)
  model = build_model('mulan_velocity', cfg)
  params, inputs = _init(model, rng)
  out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1))
  assert jnp.all(jnp.isfinite(out.loss_diff))


@pytest.mark.parametrize('vdm_type', ['mulan_epsilon', 'mulan_velocity'])
def test_ancestral_sample_step_and_generate(vdm_type, tiny_config, rng):
  model = build_model(vdm_type, tiny_config)
  params, inputs = _init(model, rng)
  z = jax.random.normal(rng, (2, 8, 8, 3))
  z_s = model.apply(params, 0, 10, z, inputs['conditioning'],
                    jax.random.fold_in(rng, 3), method=model.sample)
  assert z_s.shape == z.shape
  assert jnp.all(jnp.isfinite(z_s))
  x = model.apply(params, z, method=model.generate_x)
  assert x.shape == (2, 8, 8, 3)
  assert x.dtype in (jnp.int32, jnp.int64)
  assert int(x.min()) >= 0 and int(x.max()) < 256


def test_conditional_sample_uses_embedding(tiny_config, rng):
  model = build_model('mulan_epsilon', tiny_config)
  params, inputs = _init(model, rng)
  z = jax.random.normal(rng, (2, 8, 8, 3))
  e1 = jnp.zeros((2, tiny_config.latent_size)).at[:, :3].set(1.0)
  e2 = jnp.zeros((2, tiny_config.latent_size)).at[:, -3:].set(1.0)
  s1 = model.apply(params, 0, 10, z, e1, inputs['conditioning'],
                   rng, method=model.conditional_sample)
  s2 = model.apply(params, 0, 10, z, e2, inputs['conditioning'],
                   rng, method=model.conditional_sample)
  assert s1.shape == z.shape
  assert not np.allclose(np.asarray(s1), np.asarray(s2))


@pytest.mark.parametrize('vdm_type', ['mulan_epsilon', 'mulan_velocity'])
def test_reverse_ode_drift(vdm_type, tiny_config, rng):
  model = build_model(vdm_type, tiny_config)
  params, _ = _init(model, rng)
  x = jax.random.normal(rng, (2, 8, 8, 3))
  emb = jnp.zeros((2, tiny_config.latent_size)).at[:, :3].set(1.0)
  for hp in (False, True):
    drift = model.apply(params, x, emb, 0.5, hp, method=model.reverse_ode)
    assert drift.shape == x.shape
    assert jnp.all(jnp.isfinite(drift))


def test_apply_encoder_and_apply_gamma(tiny_config, rng):
  model = build_model('mulan_epsilon', tiny_config)
  params, inputs = _init(model, rng)
  logits = model.apply(params, inputs['images'], method=model.apply_encoder)
  assert logits.shape == (2, tiny_config.latent_size)
  g = model.apply(params, jnp.array([0.3, 0.6]), inputs['images'],
                  0, True, rngs={'sample': rng},
                  method=model.apply_gamma)
  assert g.shape == (2, tiny_config.n_pixels)
  g_nox = model.apply(params, jnp.array([0.3, 0.6]),
                      method=model.apply_gamma)
  assert g_nox.shape == (2, tiny_config.n_pixels)


def test_antithetic_time_sampling_coverage(rng):
  t = sample_times(rng, 128, antithetic=True)
  assert t.shape == (128,)
  # stratified: sorted gaps are exactly 1/n
  gaps = jnp.diff(jnp.sort(t))
  np.testing.assert_allclose(gaps, 1.0 / 128, atol=1e-6)


def test_elbo_is_consistent_across_batch_split(tiny_config, rng):
  """Per-example losses do not depend on other batch rows (needed for
  data-parallel sharding equivalence) when time sampling is iid."""
  cfg = dataclasses.replace(tiny_config, antithetic_time_sampling=False,
                            sm_pdrop=0.0)
  model = build_model('mulan_epsilon', cfg)
  params, inputs = _init(model, rng, batch=4)
  out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1))
  assert out.loss_recon.shape == (4,)
  assert jnp.all(jnp.isfinite(out.loss_recon))


def test_bf16_compute_path(tiny_config, rng):
  cfg = dataclasses.replace(tiny_config, compute_dtype='bfloat16')
  model = build_model('mulan_velocity', cfg)
  params, inputs = _init(model, rng)
  out = _elbo(model, params, inputs, jax.random.fold_in(rng, 1))
  # losses stay float32 and finite with bf16 block compute
  assert out.loss_diff.dtype == jnp.float32
  assert jnp.all(jnp.isfinite(out.loss_diff))


def test_remat_path_matches_no_remat(tiny_config, rng):
  cfg_plain = dataclasses.replace(tiny_config, sm_pdrop=0.0)
  cfg_remat = dataclasses.replace(tiny_config, sm_pdrop=0.0, remat=True)
  # pdrop > 0 + non-deterministic exercises the static `deterministic`
  # bool under nn.remat (static_argnums counts self — regression test for
  # the off-by-one that OOM-debugging found on TPU) and remat'd attention.
  cfg_train = dataclasses.replace(tiny_config, remat=True,
                                  with_attention=True)
  m3 = build_model('mulan_epsilon', cfg_train)
  params3, inputs3 = _init(m3, rng)
  out3 = _elbo(m3, params3, inputs3, jax.random.fold_in(rng, 2),
               train=True)
  assert jnp.all(jnp.isfinite(out3.loss_diff))
  m1 = build_model('mulan_epsilon', cfg_plain)
  m2 = build_model('mulan_epsilon', cfg_remat)
  params, inputs = _init(m1, rng)
  o1 = _elbo(m1, params, inputs, jax.random.fold_in(rng, 1))
  o2 = _elbo(m2, params, inputs, jax.random.fold_in(rng, 1))
  np.testing.assert_allclose(np.asarray(o1.loss_diff),
                             np.asarray(o2.loss_diff), rtol=1e-5)


def test_remat_attn_only_mode(tiny_config, rng):
  """remat='attn' (selective: checkpoint only the attention blocks) is
  param-compatible with remat='none'/'all' and computes the same ELBO."""
  cfg_plain = dataclasses.replace(tiny_config, sm_pdrop=0.0,
                                  with_attention=True)
  cfg_attn = dataclasses.replace(cfg_plain, remat='attn')
  cfg_alt = dataclasses.replace(cfg_plain, remat='alt')
  cfg_all = dataclasses.replace(cfg_plain, remat='all')
  m0 = build_model('mulan_epsilon', cfg_plain)
  params, inputs = _init(m0, rng)
  o0 = _elbo(m0, params, inputs, jax.random.fold_in(rng, 1))
  for cfg in (cfg_attn, cfg_alt, cfg_all):
    m = build_model('mulan_epsilon', cfg)
    o = _elbo(m, params, inputs, jax.random.fold_in(rng, 1))
    np.testing.assert_allclose(np.asarray(o.loss_diff),
                               np.asarray(o0.loss_diff), rtol=1e-5)
