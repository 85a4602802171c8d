"""Hardware-PRNG Pallas dropout kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu.ops.dropout import hw_dropout, seed_from_key


def test_mask_statistics_and_scaling(rng):
  x = jnp.ones((16, 32, 32, 128))
  seed = seed_from_key(rng)
  out = np.asarray(hw_dropout(x, seed, 0.1))
  # inverted dropout: either 0 or 1/(1-p)
  assert np.all((out == 0.0) | np.isclose(out, 1 / 0.9, rtol=1e-5))
  drop_frac = float(np.mean(np.asarray(out) == 0.0))
  assert 0.05 < drop_frac < 0.15
  # E[out] ~= E[x]
  assert abs(float(jnp.mean(out)) - 1.0) < 0.05


def test_deterministic_given_seed(rng):
  x = jax.random.normal(rng, (8, 8, 8, 128))
  seed = jnp.int32(1234)
  a = hw_dropout(x, seed, 0.25)
  b = hw_dropout(x, seed, 0.25)
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  c = hw_dropout(x, jnp.int32(99), 0.25)
  assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_gradient_uses_same_mask(rng):
  x = jax.random.normal(rng, (8, 16, 128))
  seed = jnp.int32(7)

  out, vjp = jax.vjp(lambda x: hw_dropout(x, seed, 0.3), x)
  (gx,) = vjp(jnp.ones_like(out))
  # gradient is exactly the mask * scale: zero where dropped
  mask_fwd = np.asarray(out) != 0.0
  mask_bwd = np.asarray(gx) != 0.0
  # out can be zero where x was zero; compare where x != 0
  nz = np.asarray(x) != 0.0
  np.testing.assert_array_equal(mask_fwd[nz], mask_bwd[nz])
  np.testing.assert_allclose(np.asarray(gx)[mask_bwd],
                             1 / 0.7, rtol=1e-5)


def test_awkward_shapes(rng):
  # last dim not lane-aligned and row count not multiple of 8
  x = jax.random.normal(rng, (3, 5, 7))
  out = hw_dropout(x, jnp.int32(3), 0.5)
  assert out.shape == x.shape
  assert jnp.all(jnp.isfinite(out))


def test_bf16_path(rng):
  x = jnp.ones((8, 8, 128), jnp.bfloat16)
  out = hw_dropout(x, jnp.int32(5), 0.1)
  assert out.dtype == jnp.bfloat16


def test_model_elbo_with_hw_dropout(tiny_config, rng):
  """Full MuLAN training-mode ELBO with use_pallas (hw dropout active)."""
  import dataclasses
  from mulan_tpu.models import build_model
  cfg = dataclasses.replace(tiny_config, use_pallas=True)
  model = build_model('mulan_epsilon', cfg)
  images = jnp.zeros((2, 8, 8, 3), 'uint8')
  labels = jnp.zeros((2,), 'int32')
  cond = jnp.zeros((2,))
  r1, r2 = jax.random.split(rng)
  params = model.init({'params': r1, 'sample': r2}, images, labels, cond,
                      step=-1.0)
  out = model.apply(params, images, labels, cond, step=0.0,
                    rngs={'sample': r2, 'dropout': jax.random.fold_in(r2, 1)},
                    deterministic=False)
  assert jnp.all(jnp.isfinite(out.loss_diff))
