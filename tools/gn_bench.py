"""Microbenchmark: GroupNorm statistic strategies on TPU.

The round-1 profile puts GroupNorm stat reductions at ~13-19% of the train
step (bf16 -> fp32 reductions over (H, W, C/G) with C minor — cross-lane
group reductions are VPU-hostile). Candidates:

  * flax: nn.GroupNorm as used by GroupNormF32 (fp32 stats via
    force_float32_reductions);
  * matmul: group sums via one MXU dot — sum_g x and sum_g x^2 computed as
    einsum('bhwc,cg->bg') against a 0/1 group-assignment matrix, turning the
    awkward 4-lane-chunk reductions into a (BHW, C) @ (C, 2G) matmul the
    systolic array eats for free; normalize stays elementwise (fuses
    downstream).

Measures fwd+bwd of an 8-block GN->swish->conv3x3 chain at flagship shapes.

  python tools/gn_bench.py
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)


import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 128, 32, 32, 128
GROUPS = 32
EPS = 1e-6
N_BLOCKS = 8


def gn_flax(x, scale, bias):
  from flax import linen as nn
  gn = nn.GroupNorm(num_groups=GROUPS, epsilon=EPS, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
  return gn.apply({'params': {'scale': scale, 'bias': bias}}, x)


def _group_matrix():
  m = np.zeros((C, GROUPS), np.float32)
  for c in range(C):
    m[c, c // (C // GROUPS)] = 1.0
  return jnp.asarray(m)


def gn_matmul(x, scale, bias):
  """Group stats on the MXU; normalize elementwise (fuses downstream)."""
  m = _group_matrix()
  xf = x.astype(jnp.float32)
  n = H * W * (C // GROUPS)
  s1 = jnp.einsum('bhwc,cg->bg', xf, m, precision='highest')
  s2 = jnp.einsum('bhwc,cg->bg', jnp.square(xf), m, precision='highest')
  mean = s1 / n
  var = s2 / n - jnp.square(mean)
  inv = jax.lax.rsqrt(var + EPS)
  # per-channel broadcast of per-group stats
  mean_c = jnp.repeat(mean, C // GROUPS, axis=1)
  inv_c = jnp.repeat(inv, C // GROUPS, axis=1)
  y = (xf - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
  y = y * scale[None, None, None, :] + bias[None, None, None, :]
  return y.astype(x.dtype)


def chain(gn_fn, params, x):
  out = x
  for i in range(N_BLOCKS):
    scale, bias, kernel = params[i]
    h = gn_fn(out, scale, bias)
    h = jax.nn.swish(h.astype(jnp.bfloat16))
    h = jax.lax.conv_general_dilated(
        h, kernel, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.bfloat16)
    out = out + h
  return (out.astype(jnp.float32) ** 2).mean()


def bench(name, gn_fn, params, x):
  loss = jax.jit(jax.grad(lambda p, xx: chain(gn_fn, p, xx)))
  g = loss(params, x)
  jax.block_until_ready(g)
  times = []
  for _ in range(10):
    t0 = time.perf_counter()
    g = loss(params, x)
    jax.block_until_ready(g)
    times.append(time.perf_counter() - t0)
  ms = float(np.median(times) * 1e3)
  # sanity: the conv chain alone is ~3x 2*B*H*W*9*C^2 flops per block
  conv_flops = 3 * 2 * B * H * W * 9 * C * C * N_BLOCKS
  print(json.dumps({'gn': name, 'ms_fwd_bwd': round(ms, 3),
                    'blocks': N_BLOCKS,
                    'implied_conv_tflops': round(conv_flops / ms / 1e9, 1)}))
  return g


def main():
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
  params = [(jnp.ones((C,)), jnp.zeros((C,)),
             jnp.asarray(rng.normal(0, 0.05, size=(3, 3, C, C)),
                         jnp.bfloat16)) for _ in range(N_BLOCKS)]

  g1 = bench('flax', gn_flax, params, x)
  g2 = bench('matmul', gn_matmul, params, x)
  # numerics agree (bf16 compute tolerance)
  err = max(float(jnp.max(jnp.abs(a[2].astype(jnp.float32)
                                  - b[2].astype(jnp.float32))))
            for a, b in zip(g1, g2))
  print(json.dumps({'max_kernel_grad_abs_diff': err}))


if __name__ == '__main__':
  main()
