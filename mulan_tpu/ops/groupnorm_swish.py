"""Fused GroupNorm+swish Pallas kernel — the SURVEY §7 north-star #1
prototype.

Motivation: the ResNet core of every UNet block is GN -> swish -> conv3x3
(reference model_vdm.py:610-657); at flagship width the GN-normalize/swish
elementwise chains in front of each conv are bandwidth-bound loop fusions
(docs/PERF.md). This kernel computes swish(groupnorm(x)) in ONE pass over
VMEM-resident data: per-sample group statistics via an MXU matmul against a
0/1 group-assignment matrix (the (H, W, C/G) cross-lane reductions that are
VPU-hostile become one (1, C) @ (C, G) dot), then normalize+swish while the
tile is still in VMEM.

The known risk, measured in round 1 for the dropout kernel (ops/dropout.py
header): activations routed THROUGH a Pallas custom call get pinned
row-major, while XLA keeps conv inputs in its preferred {3,0,2,1} layout —
the fusion can buy back its savings in layout-transpose copies around every
block. This prototype exists to SETTLE that question with a bench number
(docs/PERF.md round 5), not by assertion. Enabled via
`model.fused_gn_swish` (default OFF).

Backward pass: `jax.custom_vjp` whose bwd differentiates a pure-jnp
recompute (identical f32 math) — same cost as today's XLA backward, so the
bench delta isolates the forward fusion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _gn_swish_reference(x, scale, bias, num_groups: int, eps: float):
  """Pure-jnp swish(groupnorm(x)): f32 statistics and elementwise math,
  output cast to x.dtype — the exact computation the kernel performs (and
  the function the backward pass differentiates)."""
  b, h, w, c = x.shape
  g = num_groups
  xf = x.astype(jnp.float32).reshape(b, h * w, g, c // g)
  mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
  var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
  y = (xf - mean) * lax.rsqrt(var + eps)
  y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(
      jnp.float32)
  return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _group_matrices(c: int, g: int):
  """0/1 assignment matrices M (C, G) and its transpose (G, C), built from
  iota inside the kernel (no host constants in VMEM)."""
  cpg = c // g
  rows = lax.broadcasted_iota(jnp.int32, (c, g), 0) // cpg
  cols = lax.broadcasted_iota(jnp.int32, (c, g), 1)
  m = (rows == cols).astype(jnp.float32)
  rows_t = lax.broadcasted_iota(jnp.int32, (g, c), 1) // cpg
  cols_t = lax.broadcasted_iota(jnp.int32, (g, c), 0)
  mt = (rows_t == cols_t).astype(jnp.float32)
  return m, mt


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
            eps: float):
  h, w, c = x_ref.shape[1:]
  g = num_groups
  xf = x_ref[0].astype(jnp.float32)                      # (H, W, C)
  s1 = jnp.sum(xf, axis=(0, 1))[None, :]                 # (1, C)
  s2 = jnp.sum(xf * xf, axis=(0, 1))[None, :]
  m, mt = _group_matrices(c, g)
  n = float(h * w * (c // g))
  s1g = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n   # (1, G)
  s2g = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n
  var_g = s2g - s1g * s1g
  rstd_g = lax.rsqrt(var_g + eps)
  mean_c = jnp.dot(s1g, mt, preferred_element_type=jnp.float32)  # (1, C)
  rstd_c = jnp.dot(rstd_g, mt, preferred_element_type=jnp.float32)
  y = (xf - mean_c[0][None, None, :]) * rstd_c[0][None, None, :]
  y = y * scale_ref[0].astype(jnp.float32)[None, None, :] + bias_ref[
      0].astype(jnp.float32)[None, None, :]
  o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _fused_call(x, scale, bias, num_groups: int, eps: float,
                interpret: bool):
  b, h, w, c = x.shape
  kernel = functools.partial(_kernel, num_groups=num_groups, eps=eps)
  return pl.pallas_call(
      kernel,
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
          pl.BlockSpec((1, c), lambda i: (0, 0)),
          pl.BlockSpec((1, c), lambda i: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
      out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
      interpret=interpret,
  )(x, scale.reshape(1, c), bias.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_gn_swish(x, scale, bias, num_groups: int, eps: float = 1e-6,
                   interpret: bool = False):
  """swish(groupnorm(x)) in one Pallas pass.

  x: (B, H, W, C) bf16/f32; scale/bias: (C,) f32. Statistics are f32
  (per-sample, per-group over (H, W, C/G) — flax GroupNorm semantics),
  normalize/affine/swish are f32, output is cast to x.dtype. On CPU pass
  interpret=True (tests); the Mosaic path wants C a multiple of 128 and W a
  multiple of 8 (callers gate — GroupNormF32 falls back to the unfused
  composition otherwise).
  """
  return _fused_call(x, scale, bias, num_groups, eps, interpret)


def _fwd(x, scale, bias, num_groups, eps, interpret):
  return (_fused_call(x, scale, bias, num_groups, eps, interpret),
          (x, scale, bias))


def _bwd(num_groups, eps, interpret, res, grad):
  del interpret
  x, scale, bias = res
  _, vjp = jax.vjp(
      lambda xx, ss, bb: _gn_swish_reference(xx, ss, bb, num_groups, eps),
      x, scale, bias)
  return vjp(grad)


fused_gn_swish.defvjp(_fwd, _bwd)
