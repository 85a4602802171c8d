"""Latent machinery: straight-through top-k, gumbel, gaussian."""

import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu.models import latents


def test_topk_embedding_forward_is_hard_mask(rng):
  logits = jax.random.normal(rng, (6, 10))
  emb, kl = latents.topk_embedding(rng, logits, k=3, noise_type='gamma')
  assert emb.shape == (6, 10)
  # forward value = hard mask: exactly k ones, rest zeros
  np.testing.assert_allclose(jnp.sum(emb, axis=1), 3.0, rtol=1e-6)
  assert set(np.round(np.asarray(emb).ravel(), 5).tolist()) <= {0.0, 1.0}
  assert (kl >= -1e-6).all()


def test_topk_embedding_has_soft_gradient(rng):
  logits = jax.random.normal(rng, (2, 10))

  def loss(l):
    emb, _ = latents.topk_embedding(rng, l, k=3, noise_type='gumbel')
    return jnp.sum(emb ** 2)

  g = jax.grad(loss)(logits)
  assert jnp.any(g != 0.0), 'straight-through estimator must pass gradients'
  assert jnp.all(jnp.isfinite(g))


def test_gamma_noise_statistics(rng):
  """The staggered-Gamma perturbation is finite and positively skewed."""
  s = latents.gamma_noise(rng, k=15, shape=(2000, 10))
  assert jnp.all(jnp.isfinite(s))
  arr = np.asarray(s).ravel()
  mean = arr.mean()
  skew = ((arr - mean) ** 3).mean() / (arr.std() ** 3)
  assert skew > 0.1


def test_gumbel_embedding_one_hot(rng):
  logits = jax.random.normal(rng, (5, 10))
  emb = latents.gumbel_embedding(rng, logits, step=0)
  np.testing.assert_allclose(jnp.sum(emb, axis=1), 1.0, rtol=1e-6)
  assert set(np.round(np.asarray(emb).ravel(), 5).tolist()) <= {0.0, 1.0}


def test_gumbel_kl_nonnegative_and_zero_for_uniform():
  logits = jnp.zeros((3, 10))
  kl = latents.gumbel_kl(logits, 10)
  np.testing.assert_allclose(kl, 0.0, atol=1e-6)
  kl2 = latents.gumbel_kl(jnp.array([[10.0] + [0.0] * 9]), 10)
  assert float(kl2[0]) > 1.0


def test_gaussian_embedding_kl(rng):
  mu = jnp.zeros((4, 10))
  var = jnp.ones((4, 10))
  emb, kl = latents.gaussian_embedding(rng, mu, var)
  assert emb.shape == (4, 10)
  np.testing.assert_allclose(kl, 0.0, atol=1e-6)


def test_deterministic_embedding_all_types():
  e = latents.deterministic_embedding(4, 10, 3, 'topk')
  np.testing.assert_allclose(jnp.sum(e, axis=1), 3.0)
  e = latents.deterministic_embedding(4, 10, 3, 'gumbel')
  np.testing.assert_allclose(jnp.sum(e, axis=1), 1.0)
  e = latents.deterministic_embedding(4, 10, 3, 'gaussian')
  np.testing.assert_allclose(e, 0.0)


def test_logits_to_embeddings_parameterized_k(rng):
  logits = jax.random.normal(rng, (7, 50))
  emb = latents.logits_to_embeddings(logits, k=15)
  np.testing.assert_allclose(jnp.sum(emb, axis=-1), 15.0)
  emb5 = latents.logits_to_embeddings(logits, k=5)
  np.testing.assert_allclose(jnp.sum(emb5, axis=-1), 5.0)
