"""Data encoder/decoder: uint8 images <-> [-1, 1], exact categorical decoder.

Parity: reference /root/reference/ldm/model_vdm.py:265-303 (`EncDec`).

The decoder likelihood is an exact per-pixel categorical over `vocab_size`
values: logits_v = -0.5 * ((z - encode(v)) * exp(-gamma_0 / 2))^2, normalized
with a log-softmax over v. The reference materializes the full
(B, H, W, C, vocab) logits tensor (model_vdm.py:287-303); for the
reconstruction LOSS that tensor is immediately reduced, so here `logprob`
streams the log-normalizer with an online logsumexp over vocab chunks —
O(chunk) transient memory instead of O(vocab) — which XLA fuses into a tight
VPU loop on TPU. `decode_logits` still materializes logits for generation
(argmax / categorical sampling needs them all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mulan_tpu.models.config import ModelConfig


def encode(x: jax.Array, vocab_size: int) -> jax.Array:
  """Map discrete values {0..vocab-1} to centered bins in (-1, 1)."""
  x = jnp.round(x.astype(jnp.float32))
  return 2.0 * ((x + 0.5) / vocab_size) - 1.0


def decode_logits(z: jax.Array, g_0: jax.Array, vocab_size: int) -> jax.Array:
  """Unnormalized per-pixel categorical logits, shape (..., vocab).

  `g_0` is broadcastable to z (scalar for VDM, per-pixel for MuLAN).
  """
  vals = encode(jnp.arange(vocab_size, dtype=jnp.float32), vocab_size)
  inv_stdev = jnp.exp(-0.5 * jnp.asarray(g_0, jnp.float32))
  diff = (z[..., None] - vals) * inv_stdev[..., None]
  return -0.5 * jnp.square(diff)


def decode_logprobs(z: jax.Array, g_0: jax.Array,
                    vocab_size: int) -> jax.Array:
  """Normalized log-probabilities (log-softmax over the vocab axis)."""
  return jax.nn.log_softmax(decode_logits(z, g_0, vocab_size), axis=-1)


def logprob(x: jax.Array, z: jax.Array, g_0: jax.Array, vocab_size: int,
            chunk: int = 64) -> jax.Array:
  """log p(x | z, gamma_0) summed over pixels; shape (B,).

  Exact same value as `sum(one_hot(x) * decode_logprobs(z, g_0))`
  (reference model_vdm.py:296-303) but computed as
  logit[x] - logsumexp_v(logit[v]) with the logsumexp streamed over vocab
  chunks (online max/sum recurrence), never materializing the
  (B, H, W, C, vocab) tensor.
  """
  chunk = min(chunk, vocab_size)
  assert vocab_size % chunk == 0
  z = z.astype(jnp.float32)
  inv_stdev = jnp.exp(-0.5 * jnp.broadcast_to(
      jnp.asarray(g_0, jnp.float32), z.shape))

  # Selected-class logit.
  e_x = encode(x, vocab_size)
  logit_x = -0.5 * jnp.square((z - e_x) * inv_stdev)

  vals = encode(jnp.arange(vocab_size, dtype=jnp.float32), vocab_size)
  vals = vals.reshape(vocab_size // chunk, chunk)

  def body(carry, chunk_vals):
    m, s = carry
    l = -0.5 * jnp.square(
        (z[..., None] - chunk_vals) * inv_stdev[..., None])
    m_chunk = jnp.max(l, axis=-1)
    m_new = jnp.maximum(m, m_chunk)
    s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(l - m_new[..., None]),
                                         axis=-1)
    return (m_new, s), None

  init = (jnp.full(z.shape, -jnp.inf, jnp.float32),
          jnp.zeros(z.shape, jnp.float32))
  (m, s), _ = jax.lax.scan(body, init, vals)
  log_z = m + jnp.log(s)

  per_pixel = logit_x - log_z
  return jnp.sum(per_pixel, axis=tuple(range(1, per_pixel.ndim)))


class EncDec:
  """Thin stateless wrapper bound to a ModelConfig (no parameters)."""

  def __init__(self, config: ModelConfig):
    self.config = config

  def encode(self, x):
    return encode(x, self.config.vocab_size)

  def decode(self, z, g_0):
    return decode_logprobs(z, g_0, self.config.vocab_size)

  def decode_logits(self, z, g_0):
    return decode_logits(z, g_0, self.config.vocab_size)

  def logprob(self, x, z, g_0):
    if self.config.use_pallas:
      from mulan_tpu.ops.decoder_logprob import decoder_logprob
      return decoder_logprob(jnp.asarray(x, jnp.float32), z, g_0,
                             self.config.vocab_size)
    return logprob(x, z, g_0, self.config.vocab_size)
