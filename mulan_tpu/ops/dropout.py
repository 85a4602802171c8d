"""Pallas TPU kernel: hardware-PRNG dropout.

Training profile (round 1, v5e): the 67 per-block dropout masks cost ~30% of
the train step when generated with jax.random's counter-based threefry
(3.2 -> 4.6 steps/sec with dropout off); the 'rbg' PRNG global switch is even
slower on this chip.

Design: the Pallas kernel produces ONLY the pre-scaled mask (0 or 1/(1-p))
from the TPU hardware PRNG; the `x * mask` multiply stays in XLA, where it
fuses into neighboring ops in whatever layout they use. Feeding activations
THROUGH a Pallas kernel would pin them to row-major and surround every block
with layout-transpose copies (profiled: conv outputs here live in {3,0,2,1}).
The backward pass REGENERATES the mask from the same seed instead of keeping
it alive — zero mask residuals, zero software-PRNG lanes.

Seeds should be derived per call site from the flax 'dropout' rng stream so
layers/steps decorrelate (see `seed_from_key`).
"""

from __future__ import annotations

import functools
from typing import Optional

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


def _mask_kernel(seed_ref, out_ref, *, threshold16: int, scale: float):
  """Writes a pre-scaled {0, scale} keep-mask.

  Each hardware-PRNG uint32 word yields TWO 16-bit thresholds, halving the
  PRNG work. (A uint8-mask variant — halving HBM traffic too — measured
  SLOWER end-to-end: 5.14 vs 5.30 steps/sec; the consumer-side u8->bf16
  convert does not fuse as well as a straight bf16 load.)"""
  pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
  t, c = out_ref.shape
  bits = pltpu.bitcast(pltpu.prng_random_bits((t, c // 2)), jnp.uint32)
  thr = np.uint32(threshold16)
  # cast each half BEFORE the concat: Mosaic cannot concatenate i1 vectors
  lo = ((bits & np.uint32(0xFFFF)) >= thr).astype(out_ref.dtype)
  hi = ((bits >> np.uint32(16)) >= thr).astype(out_ref.dtype)
  out_ref[:] = jnp.concatenate([lo, hi], axis=1) * out_ref.dtype.type(scale)


def _tile(rows):
  # Large tiles keep the grid small; rows is a multiple of 32 (the int8
  # Mosaic tile is (32, 128)).
  for t in (4096, 1024, 512, 256, 64, 32):
    if rows % t == 0:
      return t
  return rows


def _shape2d(shape):
  n = int(np.prod(shape))
  cols = shape[-1]
  if cols % _LANE == 0 and (n // cols) % 32 == 0:
    rows = n // cols
  else:  # fall back to a flat padded layout
    cols = _LANE
    rows = -(-n // cols)
    rows += (-rows) % 32
  return rows, cols, n


def _threshold16(rate: float) -> int:
  return min(int(round(rate * 65536.0)), 65535)


def effective_rate(rate: float, backend: Optional[str] = None) -> float:
  """The realized drop probability on EVERY backend: the TPU kernel
  quantizes `rate` to 16-bit granularity (<= 7.6e-6 absolute error) and the
  CPU fallback adopts the same quantization, so both paths share one
  realized-rate definition and E[mask] == 1 exactly on both. The `backend`
  arg is kept for call-site documentation only."""
  del backend
  return _threshold16(rate) / 65536.0


def _hw_mask(seed, shape, rate: float, dtype) -> jax.Array:
  """Pre-scaled dropout mask of `shape`: values in {0, 1/(1-rate_eff)}."""
  if jax.default_backend() != 'tpu':
    # Off-TPU fallback (tests / CPU): same regenerate-from-seed semantics,
    # threefry bit source (pltpu.prng_* has no CPU interpret lowering).
    # Uses the TPU kernel's 16-bit-quantized effective rate so both backends
    # share ONE realized-rate definition (mask scale values match
    # cross-backend even for rates not representable in 16 bits).
    rate_eff = effective_rate(rate, 'tpu')
    scale = 1.0 / (1.0 - rate_eff)
    key = jax.random.PRNGKey(jnp.abs(seed).astype(jnp.uint32))
    keep = jax.random.bernoulli(key, 1.0 - rate_eff, shape)
    return keep.astype(dtype) * jnp.asarray(scale, dtype)
  scale = 1.0 / (1.0 - effective_rate(rate, 'tpu'))
  rows, cols, n = _shape2d(shape)
  kernel = functools.partial(_mask_kernel, threshold16=_threshold16(rate),
                             scale=scale)
  mask2d = pl.pallas_call(
      kernel,
      grid=(rows // _tile(rows),),
      in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
      out_specs=pl.BlockSpec((_tile(rows), cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
  )(seed.reshape(1))
  return mask2d.reshape(-1)[:n].reshape(shape)


def hw_mask_batch(seed, n_masks: int, shape, rate: float,
                  dtype) -> jax.Array:
  """`n_masks` pre-scaled dropout masks of `shape` from ONE pallas_call.

  The per-block `hw_dropout` path costs one mask kernel per ResNet block in
  the forward pass and one more per block in the backward regeneration —
  134 pallas_calls/step at flagship depth, ~5 ms of per-call overhead over
  the bandwidth ideal (docs/NEXT.md item 2). This variant generates every
  block's mask up front in a single kernel (same per-tile seed striping, so
  the bit streams stay decorrelated) and lets the multiply's backward read
  the SAVED mask instead of regenerating: 1 pallas_call/step total, at the
  cost of keeping the (n_masks, *shape) buffer alive to the backward pass
  (+n_masks * prod(shape) * dtype bytes of residual HBM — flag-gated via
  config.dropout_mask_batch for exactly that reason).

  Statistical contract matches `_hw_mask` (values in {0, 1/(1-rate_eff)},
  E[mask] = 1); validated on hardware by tools/tpu_checks.py.
  """
  if jax.default_backend() != 'tpu':
    # CPU fallback: one threefry draw for the whole batch of masks.
    rate_eff = effective_rate(rate, 'tpu')
    scale = 1.0 / (1.0 - rate_eff)
    key = jax.random.PRNGKey(jnp.abs(seed).astype(jnp.uint32))
    keep = jax.random.bernoulli(key, 1.0 - rate_eff, (n_masks, *shape))
    return keep.astype(dtype) * jnp.asarray(scale, dtype)
  scale = 1.0 / (1.0 - effective_rate(rate, 'tpu'))
  rows, cols, n = _shape2d(shape)
  total_rows = n_masks * rows
  kernel = functools.partial(_mask_kernel, threshold16=_threshold16(rate),
                             scale=scale)
  mask2d = pl.pallas_call(
      kernel,
      grid=(total_rows // _tile(total_rows),),
      in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
      out_specs=pl.BlockSpec((_tile(total_rows), cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((total_rows, cols), dtype),
  )(seed.reshape(1))
  return mask2d.reshape(n_masks, -1)[:, :n].reshape(n_masks, *shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x, seed, rate: float):
  """Inverted dropout with a hardware-PRNG mask; `seed` is an int32 scalar."""
  return x * _hw_mask(seed, x.shape, rate, x.dtype)


def _hw_fwd(x, seed, rate):
  return hw_dropout(x, seed, rate), seed


def _hw_bwd(rate, seed, ct):
  # identical seed + grid -> identical mask; ct matches x's shape/dtype
  return (ct * _hw_mask(seed, ct.shape, rate, ct.dtype),
          jnp.zeros_like(seed))


hw_dropout.defvjp(_hw_fwd, _hw_bwd)
