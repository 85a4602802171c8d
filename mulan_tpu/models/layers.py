"""Shared neural blocks for the VDM/MuLAN model zoo.

TPU-first reimplementation of the blocks at reference
/root/reference/ldm/model_vdm.py:309-829 (ScoreUNet internals, ResnetBlock,
AttnBlock, sinusoidal embedding, Base-2 Fourier features, DenseMonotone).
Differences from the reference by design:

  * attention flattens (H, W) into one token axis and runs a single einsum
    attention (fp32 softmax) instead of the reference's generic N-d
    axis-permutation attention fork (model_vdm.py:704-809) — identical math,
    simpler partitioning for XLA.
  * every block takes a `dtype` compute policy; parameters stay float32 and
    numerically sensitive reductions (GroupNorm statistics, softmax) are
    performed in float32 regardless of compute dtype.
  * the conditioning projection accepts either a per-batch vector (B, D) —
    broadcast spatially, as in model_vdm.py:637-641 — or a per-pixel map
    (B, H, W, D) as in ldm_unet.py:37-45, unifying the two ResnetBlocks.
"""

from __future__ import annotations

import math
from typing import Optional

from absl import logging
from flax import linen as nn
import jax
import jax.numpy as jnp
import numpy as np


_flash_fallback_warned: set = set()


def constant_init(value, dtype='float32'):
  def _init(key, shape, dtype=dtype):
    del key
    return value * jnp.ones(shape, dtype)
  return _init


def num_groups_for(channels: int, max_groups: int = 32) -> int:
  """Largest group count <= max_groups that divides `channels`.

  The reference always uses flax's default 32 groups (valid for its 128/256
  channel models); this generalizes to test-sized channel counts while being
  identical for multiples of 32.
  """
  return math.gcd(channels, max_groups)


class _ScaleBias(nn.Module):
  """Parameter holder matching nn.GroupNorm's tree ({'scale', 'bias'}) so
  the fused-kernel path keeps checkpoint-identical parameter paths."""

  features: int

  @nn.compact
  def __call__(self):
    return (self.param('scale', nn.initializers.ones, (self.features,)),
            self.param('bias', nn.initializers.zeros, (self.features,)))


class GroupNormF32(nn.Module):
  """GroupNorm: fp32 statistics, `dtype` elementwise compute.

  flax computes the mean/var reductions in float32 regardless of dtype
  (`force_float32_reductions`, flax normalization._compute_stats), so passing
  bf16 activations straight through keeps full statistic precision WITHOUT
  materializing an fp32 copy of the activation — an explicit astype(f32) here
  cost ~20% of the train step in layout-change copies (profiled on v5e).

  `fused_swish=True` returns swish(gn(x)) via the one-pass Pallas kernel
  (ops/groupnorm_swish.py) when the shape qualifies (falls back to the
  unfused composition otherwise); parameters live at the identical
  'GroupNorm_0/{scale,bias}' path either way.
  """

  dtype: jnp.dtype = jnp.float32
  fused_swish: bool = False

  @nn.compact
  def __call__(self, x):
    c = x.shape[-1]
    if self.fused_swish:
      on_tpu = jax.default_backend() == 'tpu'
      # Mosaic wants (W, C) tiles of (8, 128); interpret mode (CPU tests)
      # has no such constraint.
      if x.ndim == 4 and (not on_tpu
                          or (c % 128 == 0 and x.shape[2] % 8 == 0)):
        from mulan_tpu.ops.groupnorm_swish import fused_gn_swish
        scale, bias = _ScaleBias(c, name='GroupNorm_0')()
        return fused_gn_swish(x, scale, bias, num_groups_for(c), 1e-6,
                              not on_tpu)
      return nn.swish(
          nn.GroupNorm(num_groups=num_groups_for(c), dtype=self.dtype,
                       param_dtype=jnp.float32)(x.astype(self.dtype)))
    return nn.GroupNorm(num_groups=num_groups_for(c), dtype=self.dtype,
                        param_dtype=jnp.float32)(x.astype(self.dtype))


def timestep_embedding(t: jax.Array, dim: int,
                       dtype=jnp.float32) -> jax.Array:
  """Fairseq-style sinusoidal embedding of t (scaled by 1000).

  Parity: model_vdm.py:391-413 (`get_timestep_embedding`).
  """
  assert t.ndim == 1
  t = t.astype(jnp.float32) * 1000.0
  half = dim // 2
  freqs = jnp.exp(
      jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1)))
  args = t[:, None] * freqs[None, :]
  emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
  if dim % 2 == 1:
    emb = jnp.pad(emb, ((0, 0), (0, 1)))
  return emb.astype(dtype)


def base2_fourier_features(x: jax.Array, start: int = 6, stop: int = 8,
                           step: int = 1) -> jax.Array:
  """sin/cos of input x 2^k * 2*pi for k in [start, stop).

  Parity: model_vdm.py:812-829 (`Base2FourierFeatures`). The reference
  interleaves frequencies per input channel via repeat+tile; we reproduce the
  exact output layout.
  """
  freqs = list(range(start, stop, step))
  w = (2.0 ** jnp.asarray(freqs, dtype=x.dtype)) * 2 * jnp.pi  # (F,)
  w = jnp.tile(w[None, :], (1, x.shape[-1]))                   # (1, F*C)
  h = jnp.repeat(x, len(freqs), axis=-1)                       # (..., C*F)
  h = w * h
  return jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1)


class DenseMonotone(nn.Module):
  """Dense layer with |kernel| — monotone non-decreasing in its inputs.

  Parity: model_vdm.py:581-598.
  """

  features: int
  use_bias: bool = True
  kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
  bias_init: nn.initializers.Initializer = nn.initializers.zeros
  precision: Optional[jax.lax.Precision] = None

  @nn.compact
  def __call__(self, x):
    kernel = self.param('kernel', self.kernel_init,
                        (x.shape[-1], self.features))
    y = jnp.matmul(x, jnp.abs(kernel), precision=self.precision)
    if self.use_bias:
      y = y + self.param('bias', self.bias_init, (self.features,))
    return y


class ResnetBlock(nn.Module):
  """Conv residual block: GN-swish-conv3x3 (+cond) GN-swish-drop-conv3x3.

  Parity: model_vdm.py:610-657 and ldm_unet.py:10-61 (the two reference
  ResnetBlocks differ only in whether the conditioning projection is a
  per-batch vector broadcast over (H, W) or a per-pixel map; this block
  handles both based on `cond.ndim`). The second conv is zero-initialized so
  a fresh block is the identity. Rematerialization (the reference's
  commented-out nn.remat toggle, model_vdm.py:610-616) is applied by the
  caller via `maybe_remat(ResnetBlock, remat=True)`.
  """

  out_ch: Optional[int] = None
  pdrop: float = 0.0
  dtype: jnp.dtype = jnp.float32
  hw_dropout: bool = False  # Pallas hardware-PRNG dropout (ops/dropout.py)
  fused_gn: bool = False    # one-pass GN+swish kernel (ops/groupnorm_swish)

  def _gn_swish(self, h):
    if self.fused_gn:
      return GroupNormF32(dtype=self.dtype, fused_swish=True)(h)
    return nn.swish(GroupNormF32(dtype=self.dtype)(h))

  @nn.compact
  def __call__(self, x, cond, deterministic: bool = True,
               dropout_mask=None):
    out_ch = x.shape[-1] if self.out_ch is None else self.out_ch

    h = self._gn_swish(x)
    h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name='conv1')(h)
    if cond is not None:
      proj = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      name='cond_proj')(cond)
      if cond.ndim == 2:            # (B, D): broadcast over H, W
        h = h + proj[:, None, None, :]
      else:                         # (B, H, W, D): per-pixel bias
        assert proj.shape == h.shape, (proj.shape, h.shape)
        h = h + proj
    h = self._gn_swish(h)
    if dropout_mask is not None:    # pre-generated (batched) pre-scaled mask
      assert dropout_mask.shape == h.shape, (dropout_mask.shape, h.shape)
      h = h * dropout_mask.astype(h.dtype)
    elif self.pdrop > 0 and not deterministic and self.hw_dropout:
      from mulan_tpu.ops.dropout import hw_dropout, seed_from_key
      h = hw_dropout(h, seed_from_key(self.make_rng('dropout')), self.pdrop)
    else:
      h = nn.Dropout(rate=self.pdrop)(h, deterministic=deterministic)
    h = nn.Conv(out_ch, (3, 3), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name='conv2')(h)
    shortcut = x
    if x.shape[-1] != out_ch:
      shortcut = nn.Dense(out_ch, dtype=self.dtype, name='nin_shortcut')(x)
    return shortcut + h


def maybe_remat(block_cls, remat: bool):
  """Lift jax.checkpoint over a block module (trades FLOPs for HBM).

  static_argnums counts `self` as argument 0 in flax's remat, so
  `deterministic` in ResnetBlock.__call__(self, x, cond, deterministic)
  is index 3 — it must stay a static Python bool (the dropout branch
  does `not deterministic`)."""
  if not remat:
    return block_cls
  return nn.remat(block_cls, static_argnums=(3,))


class AttnBlock(nn.Module):
  """Self-attention residual block over the (H, W) spatial axes.

  Parity: model_vdm.py:660-701 (single-head path; the shipped configs never
  use num_heads > 1). Two execution paths:
    * XLA einsum with fp32 softmax (portable reference) — materializes the
      (B, heads, T, T) weights;
    * `use_pallas`: the Pallas TPU flash-attention kernel (blockwise online
      softmax, full custom fwd+bwd) when shapes permit — at 32x32 spatial
      tokens the materialized fp32 logits are 128 x 1024 x 1024 = 0.5 GB of
      HBM traffic per block that the kernel never touches.
  Output projection is zero-initialized so a fresh block is the identity.
  """

  num_heads: int = 1
  dtype: jnp.dtype = jnp.float32
  use_pallas: bool = False

  @nn.compact
  def __call__(self, x):
    b, hgt, wid, c = x.shape
    assert c % self.num_heads == 0
    head_dim = c // self.num_heads

    h = GroupNormF32(dtype=self.dtype)(x)
    q = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype,
                        name='q')(h)
    k = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype,
                        name='k')(h)
    v = nn.DenseGeneral((self.num_heads, head_dim), dtype=self.dtype,
                        name='v')(h)
    # Flatten spatial axes into one token axis: (B, T, heads, head_dim).
    t = hgt * wid
    q = q.reshape(b, t, self.num_heads, head_dim)
    k = k.reshape(b, t, self.num_heads, head_dim)
    v = v.reshape(b, t, self.num_heads, head_dim)

    scale = 1.0 / np.sqrt(head_dim)
    use_flash = (self.use_pallas and jax.default_backend() == 'tpu'
                 and head_dim % 128 == 0 and t % 512 == 0)
    if self.use_pallas and not use_flash and jax.default_backend() == 'tpu':
      # Trace-time (static) check: warn (once per shape) so a non-flagship
      # shape never silently loses the flash kernel on TPU. CPU fallback is
      # expected and not warned.
      key = (head_dim, t)
      if key not in _flash_fallback_warned:
        _flash_fallback_warned.add(key)
        logging.warning(
            'AttnBlock: flash attention requested but falling back to the '
            'XLA einsum path (head_dim=%d needs %%128==0, tokens=%d needs '
            '%%512==0).', head_dim, t)
    if use_flash:
      from jax.experimental.pallas.ops.tpu import flash_attention as fa
      # Explicit LARGE blocks: the kernel's 128x128 defaults put a
      # (B=128, T=1024, D=128) single-head call at ~2% MXU utilization
      # (8192 grid steps of 128x128 matmuls — profiled 26 ms/step for two
      # blocks); 512-wide blocks cut the grid 16x and feed the systolic
      # array (512, 128) @ (128, 512) tiles.
      blk = min(512, t)
      # Whole K span per major step (fewer lse fixups) — but only when it
      # divides t (the kernel rejects kv_seq_len % block_k_major != 0;
      # blk always divides t because t % 512 == 0 here).
      kmaj = 1024 if t % 1024 == 0 else blk
      sizes = fa.BlockSizes(
          block_q=kmaj, block_k_major=kmaj, block_k=blk, block_b=1,
          block_q_major_dkv=kmaj, block_k_major_dkv=kmaj, block_k_dkv=blk,
          block_q_dkv=blk, block_k_major_dq=kmaj, block_k_dq=blk,
          block_q_dq=kmaj)
      # ops/flash_bwd.py: stock forward kernel, broadcast-free backward —
      # the stock VJP materializes m/l/di broadcast to 128 lanes (6 x 64 MB
      # HBM round-trips per block bwd at flagship shapes; profiled as 14%
      # of busy time on the with_attention UNet, docs/PERF.md round 5).
      from mulan_tpu.ops.flash_bwd import flash_attention as slim_flash
      out = slim_flash(
          q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
          v.transpose(0, 2, 1, 3), scale, sizes)
      out = out.transpose(0, 2, 1, 3).astype(self.dtype)
    else:
      logits = jnp.einsum('bqhd,bkhd->bhqk', q.astype(jnp.float32) * scale,
                          k.astype(jnp.float32))
      weights = jax.nn.softmax(logits, axis=-1)
      out = jnp.einsum('bhqk,bkhd->bqhd', weights.astype(self.dtype), v)
    out = out.reshape(b, hgt, wid, self.num_heads, head_dim)
    out = nn.DenseGeneral(c, axis=(-2, -1), dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name='proj_out')(out)
    return x + out
