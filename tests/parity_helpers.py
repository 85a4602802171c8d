"""Frozen-randomness helpers shared by the reference-parity tests.

tests/test_grad_parity.py, tests/test_trajectory_parity.py and
tests/test_vdm_reparam.py compare our models against the live reference with
jax.random patched to shape-seeded constants, so both implementations draw
identical t/noise/Gamma tensors regardless of how they split keys. ONE copy
of that contract lives here: a fix to the seeding must apply to every parity
test at once.
"""

import jax
import jax.numpy as jnp
import numpy as np


def shape_seed(shape) -> int:
  seed = 987654321
  for dim in shape:
    seed = (seed * 1000003 + int(dim) + 7) % (2 ** 31 - 1)
  return seed


def frozen_randomness(monkeypatch):
  """Patch jax.random.{uniform,normal,gamma} with shape-seeded constants."""

  def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
    del key
    return jnp.full(shape, 0.375, dtype) * (maxval - minval) + minval

  def fake_normal(key, shape=(), dtype=jnp.float32):
    del key
    rs = np.random.RandomState(shape_seed(shape))
    return jnp.asarray(rs.standard_normal(shape), dtype)

  def fake_gamma(key, a, shape=None, dtype=jnp.float32):
    del key
    if shape is None:
      shape = np.shape(a)
    rs = np.random.RandomState(shape_seed(shape) ^ 0x5A5A5A)
    return jnp.asarray(rs.gamma(float(a), 1.0, size=shape), dtype)

  monkeypatch.setattr(jax.random, 'uniform', fake_uniform)
  monkeypatch.setattr(jax.random, 'normal', fake_normal)
  monkeypatch.setattr(jax.random, 'gamma', fake_gamma)
