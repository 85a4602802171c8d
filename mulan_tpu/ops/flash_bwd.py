"""Flash attention with a broadcast-free backward pass.

The stock Pallas TPU flash kernel's VJP materializes the per-row softmax
statistics broadcast to 128 lanes before EACH backward kernel:
`jnp.broadcast_to(m/l/di[..., None], (..., 128))` in both
`_flash_attention_bwd_dkv` and `_flash_attention_bwd_dq`
(jax/experimental/pallas/ops/tpu/flash_attention.py). Because a pallas_call
is an opaque custom-call boundary, XLA cannot fuse those broadcasts away:
at (B=128, H=1, T=1024) each is a 64 MB f32 HBM write + read, six per
attention block backward. Profiled on the with_attention UNet (66 blocks)
they are the entire 14%-of-busy 'broadcast' bucket — ~78 ms/step
(docs/PERF.md round 5).

This module re-derives the backward kernels for OUR attention (bidirectional,
no attention bias, no segment ids — model_vdm.py:660-701 semantics) with the
statistics passed as (B, H, T, 1) reshapes — a free metadata change — and
broadcast along lanes INSIDE the kernel, where a (block_q, 1) * (block_q,
block_k) elementwise op is a native VPU lane-broadcast. Forward pass and
numerics are identical to the stock kernel (same blockwise online-softmax
backward math); gradients are pinned against the XLA einsum path in
tests/test_pallas_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu import flash_attention as fa

# fa._flash_attention is a private API; this module depends on its argument
# order and on its residuals being (l=sum exp(logits-m), m=row max) in
# (B, H, T) layout. Fail loudly at import on signature drift rather than
# producing silently wrong gradients after a jax upgrade (semantics drift is
# additionally pinned by tests/test_pallas_ops.py's interpret-mode grads and,
# on TPU, by the skipif-gated end-to-end grad test).
import inspect as _inspect
_STOCK_PARAMS = ('q', 'k', 'v', 'ab', 'segment_ids', 'save_residuals',
                 'causal', 'sm_scale', 'block_sizes', 'debug')
if tuple(_inspect.signature(fa._flash_attention).parameters) != _STOCK_PARAMS:
  raise ImportError(
      'jax.experimental.pallas.ops.tpu.flash_attention._flash_attention '
      'changed signature; re-verify the residual contract in '
      'mulan_tpu/ops/flash_bwd.py before use.')


def _verify_blocks(q_seq_len, kv_seq_len, *, block_q_major=None, block_q=None,
                   block_k_major=None, block_k=None):
  """Reject non-dividing block sizes (the stock kernels' _verify_block).

  The slim kernels size their grids with floor division and fire the final
  store at `seq_len // block_major - 1`; a non-dividing block size would
  silently truncate the grid and leave output rows unwritten.
  """
  for name, block, dim_name, dim in (
      ('block_q_major', block_q_major, 'q_seq_len', q_seq_len),
      ('block_q', block_q, 'q_seq_len', q_seq_len),
      ('block_k_major', block_k_major, 'kv_seq_len', kv_seq_len),
      ('block_k', block_k, 'kv_seq_len', kv_seq_len)):
    if block is None:
      continue
    if block > dim:
      raise ValueError(f'{name}={block} must be <= {dim_name}={dim}')
    if dim % block != 0:
      raise ValueError(f'{dim_name}={dim} must be divisible by {name}={block}')


def _dkv_kernel(q_ref, k_ref, v_ref, l_ref, m_ref, do_ref, di_ref,
                dk_ref, dv_ref, dk_scratch, dv_scratch, *,
                sm_scale: float, q_seq_len: int, block_q: int, block_k: int):
  block_q_major = q_ref.shape[2]
  block_k_major = k_ref.shape[2]
  q_seq_index = pl.program_id(axis=3)

  @pl.when(q_seq_index == 0)
  def _init():
    dk_scratch[:, :] = jnp.zeros(dk_scratch.shape, dk_scratch.dtype)
    dv_scratch[:, :] = jnp.zeros(dv_scratch.shape, dv_scratch.dtype)

  def q_body(j, _):
    start_q = j * block_q
    q = q_ref[0, 0, pl.ds(start_q, block_q), :]
    l = l_ref[0, 0, pl.ds(start_q, block_q), :]    # (block_q, 1)
    m = m_ref[0, 0, pl.ds(start_q, block_q), :]    # (block_q, 1)
    do = do_ref[0, 0, pl.ds(start_q, block_q), :]  # (block_q, head_dim)
    di = di_ref[0, 0, pl.ds(start_q, block_q), :].astype(jnp.float32)

    def k_body(i, _):
      start_k = i * block_k
      k = k_ref[0, 0, pl.ds(start_k, block_k), :]
      v = v_ref[0, 0, pl.ds(start_k, block_k), :]
      logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
      if sm_scale != 1.0:
        logits *= sm_scale
      # (block_q, 1) statistics lane-broadcast against (block_q, block_k).
      p = jnp.exp(logits - m) / l
      dv = lax.dot(p.T.astype(do.dtype), do,
                   preferred_element_type=jnp.float32)
      dv_scratch[pl.ds(start_k, block_k), :] += dv.astype(dv_scratch.dtype)
      dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
      ds = (dp - di) * p
      if sm_scale != 1.0:
        ds = ds * sm_scale
      dk = lax.dot(ds.T.astype(q.dtype), q,
                   preferred_element_type=jnp.float32)
      dk_scratch[pl.ds(start_k, block_k), :] += dk.astype(dk_scratch.dtype)

    lax.fori_loop(0, block_k_major // block_k, k_body, None, unroll=True)

  lax.fori_loop(0, block_q_major // block_q, q_body, None, unroll=True)

  @pl.when(q_seq_index == q_seq_len // block_q_major - 1)
  def _store():
    dk_ref[0, 0, :, :] = dk_scratch[...].astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv_scratch[...].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, l_ref, m_ref, do_ref, di_ref,
               dq_ref, dq_scratch, *,
               sm_scale: float, kv_seq_len: int, block_k: int):
  block_k_major = k_ref.shape[2]
  kv_seq_index = pl.program_id(axis=3)

  @pl.when(kv_seq_index == 0)
  def _init():
    dq_scratch[:, :] = jnp.zeros(dq_scratch.shape, dq_scratch.dtype)

  q = q_ref[0, 0, :, :]
  l = l_ref[0, 0, :, :]    # (block_q_major, 1)
  m = m_ref[0, 0, :, :]
  do = do_ref[0, 0, :, :]
  di = di_ref[0, 0, :, :].astype(jnp.float32)

  def body(i, _):
    k_slice = pl.ds(i * block_k, block_k)
    k = k_ref[0, 0, k_slice, :]
    v = v_ref[0, 0, k_slice, :]
    logits = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
      logits *= sm_scale
    p = jnp.exp(logits - m) / l
    dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds = (dp - di) * p
    if sm_scale != 1.0:
      ds = ds * sm_scale
    dq_scratch[:, :] += lax.dot(
        ds.astype(k.dtype), k,
        preferred_element_type=jnp.float32).astype(dq_scratch.dtype)

  lax.fori_loop(0, block_k_major // block_k, body, None, unroll=True)

  @pl.when(kv_seq_index == kv_seq_len // block_k_major - 1)
  def _store():
    dq_ref[0, 0, :, :] = dq_scratch[...].astype(dq_ref.dtype)
    dq_scratch[...] = jnp.zeros_like(dq_scratch)


def _bwd_dkv(q, k, v, l, m, do, di, *, block_q_major, block_q,
             block_k_major, block_k, sm_scale, interpret=False):
  batch_size, num_heads, q_seq_len, head_dim = q.shape
  kv_seq_len = k.shape[2]
  _verify_blocks(q_seq_len, kv_seq_len, block_q_major=block_q_major,
                 block_q=block_q, block_k_major=block_k_major,
                 block_k=block_k)
  grid = (batch_size, num_heads, kv_seq_len // block_k_major,
          q_seq_len // block_q_major)

  def qo_map(b, h, kv_idx, q_idx):
    del kv_idx
    return (b, h, q_idx, 0)

  def kv_map(b, h, kv_idx, q_idx):
    del q_idx
    return (b, h, kv_idx, 0)

  qo_spec = pl.BlockSpec((1, 1, block_q_major, head_dim), qo_map)
  kv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), kv_map)
  lm_spec = pl.BlockSpec((1, 1, block_q_major, 1), qo_map)
  kernel = functools.partial(_dkv_kernel, sm_scale=sm_scale,
                             q_seq_len=q_seq_len, block_q=block_q,
                             block_k=block_k)
  out_shapes = [
      jax.ShapeDtypeStruct((batch_size, num_heads, kv_seq_len, head_dim),
                           k.dtype),
      jax.ShapeDtypeStruct((batch_size, num_heads, kv_seq_len, head_dim),
                           v.dtype),
  ]
  name = (f'flash_bwd_dkv_slim_{block_q_major=}_{block_q=}_'
          f'{block_k_major=}_{block_k=}')
  with jax.named_scope(name):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[qo_spec, kv_spec, kv_spec, lm_spec, lm_spec, qo_spec,
                      lm_spec],
            out_specs=[kv_spec, kv_spec],
            scratch_shapes=[
                pltpu.VMEM((block_k_major, head_dim), jnp.float32),
                pltpu.VMEM((block_k_major, head_dim), jnp.float32),
            ]),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=(
            'parallel', 'parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(q, k, v, l, m, do, di)


def _bwd_dq(q, k, v, l, m, do, di, *, block_q_major, block_k_major, block_k,
            sm_scale, interpret=False):
  batch_size, num_heads, q_seq_len, head_dim = q.shape
  kv_seq_len = k.shape[2]
  _verify_blocks(q_seq_len, kv_seq_len, block_q_major=block_q_major,
                 block_k_major=block_k_major, block_k=block_k)
  grid = (batch_size, num_heads, q_seq_len // block_q_major,
          kv_seq_len // block_k_major)

  def qo_map(b, h, q_idx, kv_idx):
    del kv_idx
    return (b, h, q_idx, 0)

  def kv_map(b, h, q_idx, kv_idx):
    del q_idx
    return (b, h, kv_idx, 0)

  qo_spec = pl.BlockSpec((1, 1, block_q_major, head_dim), qo_map)
  kv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), kv_map)
  lm_spec = pl.BlockSpec((1, 1, block_q_major, 1), qo_map)
  kernel = functools.partial(_dq_kernel, sm_scale=sm_scale,
                             kv_seq_len=kv_seq_len, block_k=block_k)
  name = f'flash_bwd_dq_slim_{block_q_major=}_{block_k_major=}_{block_k=}'
  with jax.named_scope(name):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[qo_spec, kv_spec, kv_spec, lm_spec, lm_spec, qo_spec,
                      lm_spec],
            out_specs=pl.BlockSpec((1, 1, block_q_major, head_dim), qo_map),
            scratch_shapes=[
                pltpu.VMEM((block_q_major, head_dim), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(
            'parallel', 'parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(q, k, v, l, m, do, di)


def _reference_fwd(q, k, v, sm_scale):
  """Pure-JAX forward with the STOCK kernel's residual semantics.

  Returns (o, l, m) where m is the f32 row-max of the scaled logits and
  l = sum(exp(logits - m)) — the exact quantities the stock Pallas forward
  stores when save_residuals=True (flash_attention.py `_flash_attention_impl`:
  the lane-0 slice of its l/m outputs). Used for interpret/CPU runs so the
  composed custom_vjp (residual threading, di computation, slim backward
  kernels) is testable off-TPU.
  """
  logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                      k.astype(jnp.float32))
  if sm_scale != 1.0:
    logits *= sm_scale
  m = jnp.max(logits, axis=-1)
  unnorm = jnp.exp(logits - m[..., None])
  l = jnp.sum(unnorm, axis=-1)
  o = jnp.einsum('bhqk,bhkd->bhqd', (unnorm / l[..., None]).astype(v.dtype), v)
  return o.astype(q.dtype), l, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, sm_scale, block_sizes, interpret):
  if interpret:
    o, _, _ = _reference_fwd(q, k, v, sm_scale)
    return o
  # save_residuals=False: the primal (eval/sampling, no AD) must not
  # materialize the l/m stat buffers — only _fwd (the AD path) needs them.
  return fa._flash_attention(q, k, v, None, None, False, False, sm_scale,
                             block_sizes, False)


def _fwd(q, k, v, sm_scale, block_sizes, interpret):
  if interpret:
    o, l, m = _reference_fwd(q, k, v, sm_scale)
  else:
    o, l, m = fa._flash_attention(q, k, v, None, None, True, False, sm_scale,
                                  block_sizes, False)
  return o, (q, k, v, o, l, m)


def _bwd(sm_scale, block_sizes, interpret, res, do):
  q, k, v, o, l, m = res
  di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
  # (B, H, T) -> (B, H, T, 1): reshapes, not materialized broadcasts.
  l4 = l[..., None]
  m4 = m[..., None]
  di4 = di[..., None]
  dk, dv = _bwd_dkv(q, k, v, l4, m4, do, di4,
                    block_q_major=block_sizes.block_q_major_dkv,
                    block_q=block_sizes.block_q_dkv,
                    block_k_major=block_sizes.block_k_major_dkv,
                    block_k=block_sizes.block_k_dkv, sm_scale=sm_scale,
                    interpret=interpret)
  dq = _bwd_dq(q, k, v, l4, m4, do, di4,
               block_q_major=block_sizes.block_q_dq,
               block_k_major=block_sizes.block_k_major_dq,
               block_k=block_sizes.block_k_dq, sm_scale=sm_scale,
               interpret=interpret)
  return dq, dk, dv


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, sm_scale: float, block_sizes: fa.BlockSizes,
                    interpret: bool = False):
  """Bidirectional single/multi-head flash attention, (B, H, T, D) layout.

  Forward: the stock Pallas kernel (residuals saved only under AD).
  Backward: the broadcast-free dkv/dq kernels above. No causal masking /
  attention bias / segment ids (the UNet's spatial self-attention needs
  none). interpret=True runs a pure-JAX forward with stock residual
  semantics plus the slim backward kernels in Pallas interpret mode, so the
  composed op is testable on CPU.
  """
  return _flash_attention(q, k, v, sm_scale, block_sizes, interpret)
