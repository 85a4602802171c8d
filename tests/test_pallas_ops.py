"""Pallas kernels vs the portable XLA reference paths (interpret mode on
CPU; the same kernels compile with Mosaic on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu.models import encdec
from mulan_tpu.ops.decoder_logprob import decoder_logprob


@pytest.mark.parametrize('gamma_kind', ['scalar', 'perpixel'])
def test_decoder_logprob_matches_xla(gamma_kind, rng):
  vocab = 256
  r1, r2, r3 = jax.random.split(rng, 3)
  x = jax.random.randint(r1, (4, 8, 8, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab) + 0.05 * jax.random.normal(r2, x.shape)
  if gamma_kind == 'scalar':
    g0 = jnp.float32(-8.0)
  else:
    g0 = -13.3 + 3.0 * jax.random.uniform(r3, x.shape)
  want = encdec.logprob(x, z, g0, vocab)
  got = decoder_logprob(x, z, g0, vocab)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                             atol=1e-3)


def test_decoder_logprob_gradients_match(rng):
  vocab = 256
  r1, r2, r3 = jax.random.split(rng, 3)
  x = jax.random.randint(r1, (2, 4, 4, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab) + 0.1 * jax.random.normal(r2, x.shape)
  g0 = -10.0 + 2.0 * jax.random.uniform(r3, x.shape)

  def loss_ref(z, g0):
    return jnp.sum(encdec.logprob(x, z, g0, vocab))

  def loss_pallas(z, g0):
    return jnp.sum(decoder_logprob(x, z, g0, vocab))

  gz_ref, gg_ref = jax.grad(loss_ref, argnums=(0, 1))(z, g0)
  gz_pal, gg_pal = jax.grad(loss_pallas, argnums=(0, 1))(z, g0)
  np.testing.assert_allclose(np.asarray(gz_pal), np.asarray(gz_ref),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(gg_pal), np.asarray(gg_ref),
                             rtol=1e-4, atol=1e-5)


def test_decoder_logprob_scalar_gamma_gradient(rng):
  """Scalar gamma: the g0 cotangent must be summed back to a scalar."""
  vocab = 256
  x = jax.random.randint(rng, (2, 4, 4, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab)

  def loss_pallas(g0):
    return jnp.sum(decoder_logprob(x, z, g0, vocab))

  def loss_ref(g0):
    return jnp.sum(encdec.logprob(x, z, g0, vocab))

  g0 = jnp.float32(-9.0)
  np.testing.assert_allclose(float(jax.grad(loss_pallas)(g0)),
                             float(jax.grad(loss_ref)(g0)), rtol=1e-4)


def test_mulan_elbo_with_pallas_flag_matches_xla(tiny_config, rng):
  """End-to-end: the full MuLAN ELBO with use_pallas=True equals the XLA
  path (same rngs)."""
  from mulan_tpu.models import build_model
  cfg_x = dataclasses.replace(tiny_config, sm_pdrop=0.0, use_pallas=False)
  cfg_p = dataclasses.replace(tiny_config, sm_pdrop=0.0, use_pallas=True)
  m_x = build_model('mulan_epsilon', cfg_x)
  m_p = build_model('mulan_epsilon', cfg_p)
  images = jax.random.randint(rng, (4, 8, 8, 3), 0, 256).astype('uint8')
  labels = jnp.zeros((4,), 'int32')
  cond = jnp.zeros((4,))
  r1, r2 = jax.random.split(rng)
  params = m_x.init({'params': r1, 'sample': r2}, images, labels, cond,
                    step=-1.0)
  o_x = m_x.apply(params, images, labels, cond, step=0.0,
                  rngs={'sample': r2}, deterministic=True)
  o_p = m_p.apply(params, images, labels, cond, step=0.0,
                  rngs={'sample': r2}, deterministic=True)
  np.testing.assert_allclose(np.asarray(o_p.loss_recon),
                             np.asarray(o_x.loss_recon), rtol=1e-5,
                             atol=1e-3)
  np.testing.assert_allclose(np.asarray(o_p.loss_diff),
                             np.asarray(o_x.loss_diff), rtol=1e-5)
