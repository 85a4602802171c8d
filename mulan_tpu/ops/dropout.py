"""Pallas TPU kernel: hardware-PRNG dropout.

Training profile (round 1, v5e): the 67 per-block dropout masks cost ~30% of
the train step when generated with jax.random's counter-based threefry
(3.2 -> 4.6 steps/sec with dropout off); the 'rbg' PRNG global switch is even
slower on this chip. This kernel draws the mask from the TPU's hardware PRNG
(`pltpu.prng_random_bits`) seeded from a scalar, and the backward pass
REGENERATES the same mask from the same seed instead of storing it — zero
mask residuals, zero threefry lanes in the hot loop.

Numerics: standard inverted dropout, out = x * keep / (1 - rate) with
keep = (u32 bits >= rate * 2^32). Mask distribution differs from
jax.random.bernoulli only in the bit source; training semantics are
unchanged. Seeds should be derived per call site from the flax 'dropout'
rng stream so layers/steps decorrelate (see `seed_from_key`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def seed_from_key(key) -> jax.Array:
  """Derive an int32 scalar seed from a jax PRNG key."""
  data = jax.random.key_data(key)
  return jnp.asarray(data.reshape(-1)[-1], jnp.int32)


def _dropout_kernel(seed_ref, x_ref, out_ref, *, rate: float, scale: float):
  pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
  bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
  threshold = np.uint32(min(int(rate * 4294967296.0), 4294967295))
  keep = (bits >= threshold).astype(x_ref.dtype)
  out_ref[:] = x_ref[:] * keep * x_ref.dtype.type(scale)


def _mask_apply(x2, seed, rate, scale, tile):
  rows, cols = x2.shape
  kernel = functools.partial(_dropout_kernel, rate=rate, scale=scale)
  return pl.pallas_call(
      kernel,
      grid=(rows // tile,),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec((tile, cols), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
      interpret=jax.default_backend() not in ('tpu',),
  )(seed, x2)


def _shape2d(x):
  n = int(np.prod(x.shape))
  cols = x.shape[-1]
  if cols % _LANE == 0 and (n // cols) % 8 == 0:
    rows = n // cols
  else:  # fall back to a flat padded layout
    cols = _LANE
    rows = -(-n // cols)
    rows += (-rows) % 8
  return rows, cols, n


def _tile(rows):
  # Large tiles keep the grid small (fewer kernel launches; 4096x128 fp32 is
  # 2 MB/block, well within VMEM with double buffering); rows is a multiple
  # of 8.
  for t in (4096, 1024, 512, 256, 64, 8):
    if rows % t == 0:
      return t
  return rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x, seed, rate: float):
  """Inverted dropout with hardware PRNG; `seed` is an int32 scalar."""
  out, _ = _hw_fwd(x, seed, rate)
  return out


def _apply(x, seed, rate):
  if jax.default_backend() != 'tpu':
    # Off-TPU fallback (tests / CPU): same API and same
    # regenerate-from-seed semantics, threefry bit source. pltpu.prng_seed
    # has no CPU interpret-mode lowering.
    key = jax.random.PRNGKey(jnp.abs(seed).astype(jnp.uint32))
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x * x.dtype.type(1.0 / (1.0 - rate)),
                     jnp.zeros_like(x))
  rows, cols, n = _shape2d(x)
  flat = x.reshape(-1)
  pad = rows * cols - n
  if pad:
    flat = jnp.pad(flat, (0, pad))
  x2 = flat.reshape(rows, cols)
  out = _mask_apply(x2, seed.reshape(1), rate, 1.0 / (1.0 - rate),
                    _tile(rows))
  return out.reshape(-1)[:n].reshape(x.shape)


def _hw_fwd(x, seed, rate):
  return _apply(x, seed, rate), (seed,)


def _hw_bwd(rate, residuals, ct):
  (seed,) = residuals
  # identical seed + grid -> identical mask
  return _apply(ct, seed, rate), jnp.zeros_like(seed)


hw_dropout.defvjp(_hw_fwd, _hw_bwd)
