"""Decoder likelihood: streamed logprob vs naive materialized reference."""

import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu.models import encdec


def _naive_logprob(x, z, g_0, vocab):
  """Reference formulation (model_vdm.py:296-303): one-hot dot log-softmax
  over the fully materialized logits tensor."""
  x_onehot = jax.nn.one_hot(jnp.round(x).astype(jnp.int32), vocab)
  logprobs = encdec.decode_logprobs(z, g_0, vocab)
  return jnp.sum(x_onehot * logprobs, axis=(1, 2, 3, 4))


def test_streamed_logprob_matches_naive_scalar_gamma(rng):
  vocab = 256
  r1, r2 = jax.random.split(rng)
  x = jax.random.randint(r1, (4, 8, 8, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab) + 0.05 * jax.random.normal(r2, (4, 8, 8, 3))
  g0 = jnp.float32(-13.3)
  got = encdec.logprob(x, z, g0, vocab)
  want = _naive_logprob(x, z, g0, vocab)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_streamed_logprob_matches_naive_perpixel_gamma(rng):
  vocab = 256
  r1, r2, r3 = jax.random.split(rng, 3)
  x = jax.random.randint(r1, (2, 8, 8, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab) + 0.01 * jax.random.normal(r2, (2, 8, 8, 3))
  g0 = -13.3 + 2.0 * jax.random.uniform(r3, (2, 8, 8, 3))
  got = encdec.logprob(x, z, g0, vocab)
  want = _naive_logprob(x, z, g0, vocab)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_streamed_logprob_chunk_invariance(rng):
  vocab = 256
  x = jax.random.randint(rng, (2, 4, 4, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab)
  g0 = jnp.float32(-10.0)
  full = encdec.logprob(x, z, g0, vocab, chunk=256)
  for chunk in (16, 32, 64, 128):
    np.testing.assert_allclose(
        encdec.logprob(x, z, g0, vocab, chunk=chunk), full, rtol=1e-6)


def test_encode_range_and_decode_normalization():
  vocab = 256
  x = jnp.arange(vocab, dtype=jnp.float32)
  e = encdec.encode(x, vocab)
  assert float(e.min()) > -1.0 and float(e.max()) < 1.0
  assert float(e[0]) == -1.0 + 1.0 / vocab
  # decode log-probs normalize over vocab
  z = jnp.zeros((1, 2, 2, 3))
  lp = encdec.decode_logprobs(z, jnp.float32(-5.0), vocab)
  np.testing.assert_allclose(
      jnp.sum(jnp.exp(lp), axis=-1), 1.0, rtol=1e-4)


def test_logprob_peaks_at_true_pixel(rng):
  """With tiny gamma_0 (low noise), argmax of decoder logits recovers x."""
  vocab = 256
  x = jax.random.randint(rng, (2, 4, 4, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab)
  logits = encdec.decode_logits(z, jnp.float32(-13.3), vocab)
  recovered = jnp.argmax(logits, axis=-1)
  np.testing.assert_array_equal(np.asarray(recovered),
                                np.asarray(x, np.int64))
