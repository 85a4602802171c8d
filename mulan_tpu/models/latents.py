"""Discrete/continuous latent machinery for MuLAN.

Parity: /root/reference/ldm/model_mulan_epsilon.py:195-271 (gumbel
straight-through, smoothed top-k with Gamma noise, Gaussian reparam) and
notebook_utils.py:548-551 (hard top-k for eval, here parameterized by k
instead of hard-coding 15).

All functions are pure (explicit rng); the model module threads its 'sample'
rng stream through them. The reference's epsilon and velocity models disagree
on whether `topk_noise_type` is respected (epsilon: yes,
model_mulan_epsilon.py:236-239; velocity: always Gamma,
model_mulan_velocity.py:106-120). We respect the config in both models —
the shipped configs set 'gamma', so behavior is identical for them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_kl(logits: jax.Array, latent_size: int) -> jax.Array:
  """KL(softmax(logits) || Uniform(latent_size)); shape (B,)."""
  q = jax.nn.softmax(logits, axis=-1)
  log_q = jax.nn.log_softmax(logits, axis=-1)
  return jnp.sum(q * (log_q - jnp.log(1.0 / latent_size)), axis=-1)


def gamma_noise(rng: jax.Array, k: int, shape, gamma_tau: float = 10.0,
                n_terms: int = 10) -> jax.Array:
  """Smoothed top-k perturbation: sum of staggered Gamma(1/k) variates.

  Parity: model_mulan_epsilon.py:221-231 — s = sum_i Gamma(1/k)/ (k/i)
  for i in 1..10, minus log(10), scaled by gamma_tau/k.
  """
  noise = jax.random.gamma(rng, 1.0 / k, shape=(n_terms, *shape))
  beta = k / jnp.arange(1.0, n_terms + 1.0)
  beta = beta.reshape((n_terms,) + (1,) * len(shape))
  s = jnp.sum(noise / beta, axis=0) - jnp.log(float(n_terms))
  return gamma_tau * (s / k)


def topk_embedding(rng: jax.Array, logits: jax.Array, k: int,
                   noise_type: str = 'gamma'):
  """Straight-through smoothed top-k (sahoo et al., arXiv:2205.15213).

  Returns (embedding, kl) where kl is computed on the PRE-noise logits
  (model_mulan_epsilon.py:233-252).
  """
  latent_size = logits.shape[-1]
  kl = gumbel_kl(logits, latent_size)
  if noise_type == 'gamma':
    logits = logits + gamma_noise(rng, k=k, shape=logits.shape)
  elif noise_type == 'gumbel':
    logits = logits + jax.random.gumbel(rng, logits.shape)
  else:
    raise ValueError(f'unknown topk_noise_type: {noise_type!r}')

  logits = logits - jnp.mean(logits, axis=-1, keepdims=True)
  soft = logits / jnp.linalg.norm(logits, axis=-1, keepdims=True)
  kth = jax.lax.top_k(logits, k)[0][:, -1]
  hard = (logits >= kth[:, None]).astype(jnp.float32)
  embedding = jax.lax.stop_gradient(hard - soft) + soft
  return embedding, kl


def gumbel_embedding(rng: jax.Array, logits: jax.Array, step) -> jax.Array:
  """Straight-through Gumbel argmax with tau annealed 1 -> 0.5.

  Parity: model_mulan_epsilon.py:195-219.
  """
  tau = jnp.maximum(0.5, jnp.exp(-1e-5 * step))
  noisy = (logits + jax.random.gumbel(rng, logits.shape)) / tau
  soft = jax.nn.softmax(noisy, axis=-1)
  hard = jax.nn.one_hot(jnp.argmax(noisy, axis=-1), logits.shape[-1])
  return jax.lax.stop_gradient(hard - soft) + soft


def gaussian_embedding(rng: jax.Array, mu: jax.Array, var: jax.Array):
  """Reparameterized Gaussian latent + analytic KL to N(0, 1)."""
  eps = jax.random.normal(rng, mu.shape)
  embedding = mu + jnp.sqrt(var) * eps
  kl = 0.5 * jnp.sum(mu ** 2 + var - jnp.log(var) - 1.0, axis=-1)
  return embedding, kl


def deterministic_embedding(batch_size: int, latent_size: int, latent_k: int,
                            latent_type: str) -> jax.Array:
  """Canonical embedding for unconditional sampling
  (model_mulan_epsilon.py:365-375)."""
  if latent_type == 'gumbel':
    return jax.nn.one_hot(jnp.ones(batch_size, jnp.int32), latent_size)
  if latent_type == 'topk':
    ones = jnp.ones((batch_size, latent_k))
    zeros = jnp.zeros((batch_size, latent_size - latent_k))
    return jnp.concatenate([ones, zeros], axis=1)
  if latent_type == 'gaussian':
    return jnp.zeros((batch_size, latent_size))
  raise ValueError(f'unknown latent_type: {latent_type!r}')


def logits_to_embeddings(logits: jax.Array, k: int) -> jax.Array:
  """Hard top-k of logits -> {0,1} embedding (eval path).

  Parity: notebook_utils.py:548-551 with k parameterized (the reference
  hard-codes 15).
  """
  kth = jax.lax.top_k(logits, k)[0][..., -1]
  return (logits >= kth[..., None]).astype(jnp.float32)
