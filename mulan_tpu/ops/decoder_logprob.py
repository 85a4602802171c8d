"""Pallas TPU kernel: fused per-pixel categorical decoder log-likelihood.

Computes log p(x | z, gamma_0) = sum_pixels [ l_x - logsumexp_v l_v ] with
l_v = -0.5 * ((z - encode(v)) * exp(-gamma_0/2))^2, in ONE pass over the
vocabulary held in VMEM — never materializing the (B, H, W, C, vocab) logits
tensor the reference builds (model_vdm.py:287-303; ~400 MB at CIFAR train
shapes) nor the chunked XLA-scan transients of the portable fallback
(models/encdec.logprob).

The backward pass has a closed form in the softmax moments
(p_v = softmax_v(l_v), inv_var = exp(-gamma_0)):
  d l_x/dz = -(z - e_x) inv_var,   d logsumexp/dz = -inv_var (z - E_p[e_v])
  grad_z   = inv_var * (e_x - E_p[e_v])
  grad_g0  = 0.5 * inv_var * ((z - e_x)^2 - E_p[(z - e_v)^2])
so the backward kernel just accumulates the online-softmax moments E_p[e]
and E_p[(z-e)^2] — no autodiff through the vocab loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _encode_val(v, vocab_size: int):
  return 2.0 * ((v + 0.5) / vocab_size) - 1.0


def _fwd_kernel(x_ref, z_ref, g_ref, out_ref, *, vocab_size: int,
                n_valid: int):
  z = z_ref[:]
  inv_stdev = jnp.exp(-0.5 * g_ref[:])
  e_x = _encode_val(jnp.round(x_ref[:]), vocab_size)
  l_x = -0.5 * jnp.square((z - e_x) * inv_stdev)

  def body(v, carry):
    m, s = carry
    e_v = _encode_val(v.astype(jnp.float32), vocab_size)
    l = -0.5 * jnp.square((z - e_v) * inv_stdev)
    m_new = jnp.maximum(m, l)
    s = s * jnp.exp(m - m_new) + jnp.exp(l - m_new)
    return m_new, s

  m0 = jnp.full(z.shape, -jnp.inf, jnp.float32)
  s0 = jnp.zeros(z.shape, jnp.float32)
  m, s = jax.lax.fori_loop(0, vocab_size, body, (m0, s0))
  log_z = m + jnp.log(s)

  mask = (jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
          < n_valid).astype(jnp.float32)
  out_ref[:] = jnp.sum((l_x - log_z) * mask, axis=1, keepdims=True)


def _bwd_kernel(x_ref, z_ref, g_ref, ct_ref, dz_ref, dg_ref, *,
                vocab_size: int, n_valid: int):
  z = z_ref[:]
  g = g_ref[:]
  inv_var = jnp.exp(-g)
  inv_stdev = jnp.exp(-0.5 * g)
  e_x = _encode_val(jnp.round(x_ref[:]), vocab_size)

  def body(v, carry):
    m, s, sum_e, sum_sq = carry
    e_v = _encode_val(v.astype(jnp.float32), vocab_size)
    diff = z - e_v
    l = -0.5 * jnp.square(diff * inv_stdev)
    m_new = jnp.maximum(m, l)
    rescale = jnp.exp(m - m_new)
    w = jnp.exp(l - m_new)
    return (m_new, s * rescale + w, sum_e * rescale + w * e_v,
            sum_sq * rescale + w * jnp.square(diff))

  m0 = jnp.full(z.shape, -jnp.inf, jnp.float32)
  zeros = jnp.zeros(z.shape, jnp.float32)
  _, s, sum_e, sum_sq = jax.lax.fori_loop(
      0, vocab_size, body, (m0, zeros, zeros, zeros))
  mean_e = sum_e / s
  mean_sq = sum_sq / s

  mask = (jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
          < n_valid).astype(jnp.float32)
  ct = ct_ref[:]  # (TB, 1) cotangent of the per-example sum
  dz_ref[:] = ct * mask * inv_var * (e_x - mean_e)
  dg_ref[:] = ct * mask * 0.5 * inv_var * (
      jnp.square(z - e_x) - mean_sq)


def _pad_cols(a, dp):
  return jnp.pad(a, ((0, 0), (0, dp - a.shape[1])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def decoder_logprob(x, z, g0, vocab_size: int = 256):
  """log p(x | z, g0) summed over pixels; x/z/g0 shaped (B, ...)."""
  out, _ = _fwd(x, z, g0, vocab_size)
  return out


def _run_fwd(x2, z2, g2, vocab_size, d):
  b, dp = z2.shape
  # Mosaic wants the sublane block divisible by 8 or spanning the full dim.
  tb = 8 if b % 8 == 0 else b
  kernel = functools.partial(_fwd_kernel, vocab_size=vocab_size, n_valid=d)
  out = pl.pallas_call(
      kernel,
      grid=(b // tb,),
      in_specs=[pl.BlockSpec((tb, dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] * 3,
      out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
      interpret=_interpret_mode(),
  )(x2, z2, g2)
  return out[:, 0]


def _prep(x, z, g0, vocab_size):
  b = x.shape[0]
  d = int(np.prod(x.shape[1:]))
  dp = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
  x2 = _pad_cols(x.reshape(b, d).astype(jnp.float32), dp)
  z2 = _pad_cols(z.reshape(b, d).astype(jnp.float32), dp)
  g2 = _pad_cols(jnp.broadcast_to(jnp.asarray(g0, jnp.float32),
                                  z.shape).reshape(b, d), dp)
  return x2, z2, g2, d


def _fwd(x, z, g0, vocab_size):
  x2, z2, g2, d = _prep(x, z, g0, vocab_size)
  out = _run_fwd(x2, z2, g2, vocab_size, d)
  return out, (x, z, g0)


def _bwd(vocab_size, residuals, ct):
  x, z, g0 = residuals
  x2, z2, g2, d = _prep(x, z, g0, vocab_size)
  b, dp = z2.shape
  tb = 8 if b % 8 == 0 else b
  kernel = functools.partial(_bwd_kernel, vocab_size=vocab_size, n_valid=d)
  dz2, dg2 = pl.pallas_call(
      kernel,
      grid=(b // tb,),
      in_specs=[pl.BlockSpec((tb, dp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] * 3 + [
          pl.BlockSpec((tb, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)],
      out_specs=[pl.BlockSpec((tb, dp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 2,
      out_shape=[jax.ShapeDtypeStruct((b, dp), jnp.float32)] * 2,
      interpret=_interpret_mode(),
  )(x2, z2, g2, ct.reshape(b, 1).astype(jnp.float32))
  dz = dz2[:, :d].reshape(z.shape)
  dg_full = dg2[:, :d].reshape(z.shape)
  # g0 may have been broadcast (scalar gamma); sum the cotangent back.
  g0_arr = jnp.asarray(g0)
  if g0_arr.shape == z.shape:
    dg = dg_full
  else:
    dg = jnp.sum(dg_full).reshape(g0_arr.shape) if g0_arr.ndim == 0 else (
        jnp.sum(dg_full, axis=tuple(range(1, dg_full.ndim))).reshape(
            g0_arr.shape))
  return jnp.zeros_like(jnp.asarray(x, jnp.float32)), dz, dg


decoder_logprob.defvjp(_fwd, _bwd)


def _interpret_mode() -> bool:
  """Run the kernel in interpreter mode off-TPU (tests on CPU)."""
  return jax.default_backend() not in ('tpu',)
