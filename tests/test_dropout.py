"""Hardware-PRNG Pallas dropout kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu.ops.dropout import (effective_rate, hw_dropout, hw_mask_batch,
                                   seed_from_key)


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


def test_mask_batch_statistics():
  """hw_mask_batch shares _hw_mask's statistical contract: {0, scale}
  values at the quantized effective rate, distinct masks per slot."""
  rate = 0.1
  masks = np.asarray(hw_mask_batch(jnp.int32(42), 4, (8, 16, 128), rate,
                                   jnp.float32))
  assert masks.shape == (4, 8, 16, 128)
  scale = 1.0 / (1.0 - effective_rate(rate))
  assert np.all((masks == 0.0) | np.isclose(masks, scale, rtol=1e-6))
  fracs = (masks == 0.0).reshape(4, -1).mean(axis=1)
  assert np.all(np.abs(fracs - rate) < 0.03), fracs
  for i in range(4):
    for j in range(i + 1, 4):
      assert not np.array_equal(masks[i], masks[j])


def test_model_elbo_with_batched_dropout_masks(tiny_config, rng):
  """Training-mode ELBO with dropout_mask_batch: one mask batch per UNet
  call, and the result is finite with the masks actually applied."""
  import dataclasses
  from mulan_tpu.models import build_model
  cfg = dataclasses.replace(tiny_config, use_pallas=True,
                            dropout_mask_batch=True)
  model = build_model('mulan_epsilon', cfg)
  images = jnp.zeros((2, 8, 8, 3), 'uint8')
  labels = jnp.zeros((2,), 'int32')
  cond = jnp.zeros((2,))
  r1, r2 = jax.random.split(rng)
  params = model.init({'params': r1, 'sample': r2}, images, labels, cond,
                      step=-1.0)
  rngs = {'sample': r2, 'dropout': jax.random.fold_in(r2, 1)}
  out = model.apply(params, images, labels, cond, step=0.0, rngs=rngs,
                    deterministic=False)
  assert jnp.all(jnp.isfinite(out.loss_diff))
  # gradients flow through the mask multiply
  def loss(p):
    o = model.apply(p, images, labels, cond, step=0.0, rngs=rngs,
                    deterministic=False)
    return jnp.sum(o.loss_diff)
  grads = jax.grad(loss)(params)
  gnorm = float(jnp.sqrt(sum(jnp.sum(g * g).astype(jnp.float32)
                             for g in jax.tree.leaves(grads))))
  assert np.isfinite(gnorm) and gnorm > 0


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
