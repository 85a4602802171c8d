"""Pallas kernels vs the portable XLA reference paths (interpret mode on
CPU; the same kernels compile with Mosaic on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu.models import encdec
from mulan_tpu.ops.decoder_logprob import decoder_logprob


@pytest.mark.parametrize('gamma_kind', ['scalar', 'perpixel'])
def test_decoder_logprob_matches_xla(gamma_kind, rng):
  vocab = 256
  r1, r2, r3 = jax.random.split(rng, 3)
  x = jax.random.randint(r1, (4, 8, 8, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab) + 0.05 * jax.random.normal(r2, x.shape)
  if gamma_kind == 'scalar':
    g0 = jnp.float32(-8.0)
  else:
    g0 = -13.3 + 3.0 * jax.random.uniform(r3, x.shape)
  want = encdec.logprob(x, z, g0, vocab)
  got = decoder_logprob(x, z, g0, vocab)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                             atol=1e-3)


def test_decoder_logprob_gradients_match(rng):
  vocab = 256
  r1, r2, r3 = jax.random.split(rng, 3)
  x = jax.random.randint(r1, (2, 4, 4, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab) + 0.1 * jax.random.normal(r2, x.shape)
  g0 = -10.0 + 2.0 * jax.random.uniform(r3, x.shape)

  def loss_ref(z, g0):
    return jnp.sum(encdec.logprob(x, z, g0, vocab))

  def loss_pallas(z, g0):
    return jnp.sum(decoder_logprob(x, z, g0, vocab))

  gz_ref, gg_ref = jax.grad(loss_ref, argnums=(0, 1))(z, g0)
  gz_pal, gg_pal = jax.grad(loss_pallas, argnums=(0, 1))(z, g0)
  np.testing.assert_allclose(np.asarray(gz_pal), np.asarray(gz_ref),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(gg_pal), np.asarray(gg_ref),
                             rtol=1e-4, atol=1e-5)


def test_decoder_logprob_scalar_gamma_gradient(rng):
  """Scalar gamma: the g0 cotangent must be summed back to a scalar."""
  vocab = 256
  x = jax.random.randint(rng, (2, 4, 4, 3), 0, vocab).astype(jnp.float32)
  z = encdec.encode(x, vocab)

  def loss_pallas(g0):
    return jnp.sum(decoder_logprob(x, z, g0, vocab))

  def loss_ref(g0):
    return jnp.sum(encdec.logprob(x, z, g0, vocab))

  g0 = jnp.float32(-9.0)
  np.testing.assert_allclose(float(jax.grad(loss_pallas)(g0)),
                             float(jax.grad(loss_ref)(g0)), rtol=1e-4)


def test_mulan_elbo_with_pallas_flag_matches_xla(tiny_config, rng):
  """End-to-end: the full MuLAN ELBO with use_pallas=True equals the XLA
  path (same rngs)."""
  from mulan_tpu.models import build_model
  cfg_x = dataclasses.replace(tiny_config, sm_pdrop=0.0, use_pallas=False)
  cfg_p = dataclasses.replace(tiny_config, sm_pdrop=0.0, use_pallas=True)
  m_x = build_model('mulan_epsilon', cfg_x)
  m_p = build_model('mulan_epsilon', cfg_p)
  images = jax.random.randint(rng, (4, 8, 8, 3), 0, 256).astype('uint8')
  labels = jnp.zeros((4,), 'int32')
  cond = jnp.zeros((4,))
  r1, r2 = jax.random.split(rng)
  params = m_x.init({'params': r1, 'sample': r2}, images, labels, cond,
                    step=-1.0)
  o_x = m_x.apply(params, images, labels, cond, step=0.0,
                  rngs={'sample': r2}, deterministic=True)
  o_p = m_p.apply(params, images, labels, cond, step=0.0,
                  rngs={'sample': r2}, deterministic=True)
  np.testing.assert_allclose(np.asarray(o_p.loss_recon),
                             np.asarray(o_x.loss_recon), rtol=1e-5,
                             atol=1e-3)
  np.testing.assert_allclose(np.asarray(o_p.loss_diff),
                             np.asarray(o_x.loss_diff), rtol=1e-5)


# ---------------------------------------------------------------------------
# Fused GroupNorm+swish (ops/groupnorm_swish.py — SURVEY §7 north-star #1)
# ---------------------------------------------------------------------------

def _gn_swish_flax(x, scale, bias, dtype):
  """Today's production composition: nn.swish(GroupNormF32(dtype)(x))."""
  from flax import linen as nn
  from mulan_tpu.models.layers import num_groups_for
  gn = nn.GroupNorm(num_groups=num_groups_for(x.shape[-1]), dtype=dtype,
                    param_dtype=jnp.float32)
  out = gn.apply({'params': {'scale': scale, 'bias': bias}},
                 x.astype(dtype))
  return jax.nn.swish(out)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize('shape', [(2, 8, 8, 128), (3, 4, 8, 32)])
def test_fused_gn_swish_matches_flax(rng, dtype, shape):
  from mulan_tpu.models.layers import num_groups_for
  from mulan_tpu.ops.groupnorm_swish import fused_gn_swish
  r1, r2, r3 = jax.random.split(rng, 3)
  x = (2.0 * jax.random.normal(r1, shape)).astype(dtype)
  c = shape[-1]
  scale = 1.0 + 0.1 * jax.random.normal(r2, (c,))
  bias = 0.1 * jax.random.normal(r3, (c,))
  want = _gn_swish_flax(x, scale, bias, dtype)
  got = fused_gn_swish(x, scale, bias, num_groups_for(c), 1e-6, True)
  assert got.dtype == x.dtype
  # bf16: the kernel keeps the normalize/affine/swish chain in f32 and
  # casts ONCE at the end; flax casts to bf16 before the (XLA) swish — one
  # bf16 ulp of headroom at |y|~4.
  tol = dict(rtol=1e-5, atol=1e-5) if dtype == jnp.float32 else dict(
      rtol=0.02, atol=0.05)
  np.testing.assert_allclose(np.asarray(got, np.float32),
                             np.asarray(want, np.float32), **tol)


def test_fused_gn_swish_gradients_match(rng):
  from mulan_tpu.models.layers import num_groups_for
  from mulan_tpu.ops.groupnorm_swish import fused_gn_swish
  r1, r2, r3 = jax.random.split(rng, 3)
  shape = (2, 4, 8, 64)
  x = 2.0 * jax.random.normal(r1, shape)
  scale = 1.0 + 0.1 * jax.random.normal(r2, (shape[-1],))
  bias = 0.1 * jax.random.normal(r3, (shape[-1],))
  g = num_groups_for(shape[-1])

  def loss_flax(x, s, b):
    return jnp.sum(jnp.square(_gn_swish_flax(x, s, b, jnp.float32)))

  def loss_fused(x, s, b):
    return jnp.sum(jnp.square(fused_gn_swish(x, s, b, g, 1e-6, True)))

  want = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
  got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
  for w, gg, name in zip(want, got, ('x', 'scale', 'bias')):
    np.testing.assert_allclose(np.asarray(gg), np.asarray(w), rtol=1e-4,
                               atol=1e-5, err_msg=f'grad wrt {name}')


def test_unet_fused_gn_flag_matches_and_keeps_param_paths(tiny_config, rng):
  """The model-level flag: identical param tree (checkpoint compatibility)
  and matching ELBO with fused_gn_swish on/off (interpret mode on CPU)."""
  from mulan_tpu.models import build_model
  cfg_x = dataclasses.replace(tiny_config, sm_pdrop=0.0)
  cfg_f = dataclasses.replace(tiny_config, sm_pdrop=0.0,
                              fused_gn_swish=True)
  m_x = build_model('mulan_epsilon', cfg_x)
  m_f = build_model('mulan_epsilon', cfg_f)
  images = jax.random.randint(rng, (4, 8, 8, 3), 0, 256).astype('uint8')
  labels = jnp.zeros((4,), 'int32')
  cond = jnp.zeros((4,))
  r1, r2 = jax.random.split(rng)
  params = m_x.init({'params': r1, 'sample': r2}, images, labels, cond,
                    step=-1.0)
  params_f = m_f.init({'params': r1, 'sample': r2}, images, labels, cond,
                      step=-1.0)
  assert (jax.tree_util.tree_structure(params)
          == jax.tree_util.tree_structure(params_f))
  o_x = m_x.apply(params, images, labels, cond, step=0.0,
                  rngs={'sample': r2}, deterministic=True)
  o_f = m_f.apply(params, images, labels, cond, step=0.0,
                  rngs={'sample': r2}, deterministic=True)
  np.testing.assert_allclose(np.asarray(o_f.loss_diff),
                             np.asarray(o_x.loss_diff), rtol=1e-5,
                             atol=1e-5)


# ---------------------------------------------------------------------------
# Broadcast-free flash-attention backward (ops/flash_bwd.py)
# ---------------------------------------------------------------------------

def _ref_attention_with_stats(q, k, v, scale):
  """Reference attention + the (l, m) softmax statistics the flash forward
  saves (library semantics: m = row max of scaled logits, l = sum of
  exp(logits - m), o = (p / l) @ v)."""
  logits = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                      k.astype(jnp.float32)) * scale
  m = jnp.max(logits, axis=-1)
  p = jnp.exp(logits - m[..., None])
  l = jnp.sum(p, axis=-1)
  o = jnp.einsum('bhqk,bhkd->bhqd', p / l[..., None],
                 v.astype(jnp.float32))
  return o, l, m


def test_flash_bwd_slim_kernels_match_autodiff(rng):
  """The dkv/dq kernels (statistics passed as (B,H,T,1), lane-broadcast in
  VMEM) must reproduce jax.grad of reference attention (interpret mode)."""
  from mulan_tpu.ops.flash_bwd import _bwd_dkv, _bwd_dq
  b, h, t, d = 2, 1, 256, 128
  scale = 1.0 / np.sqrt(d)
  r1, r2, r3, r4 = jax.random.split(rng, 4)
  q = jax.random.normal(r1, (b, h, t, d))
  k = jax.random.normal(r2, (b, h, t, d))
  v = jax.random.normal(r3, (b, h, t, d))
  do = jax.random.normal(r4, (b, h, t, d))

  def loss(q, k, v):
    o, _, _ = _ref_attention_with_stats(q, k, v, scale)
    return jnp.sum(o * do)

  dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

  o, l, m = _ref_attention_with_stats(q, k, v, scale)
  di = jnp.sum(o * do.astype(jnp.float32), axis=-1)
  l4, m4, di4 = l[..., None], m[..., None], di[..., None]
  kw = dict(block_q_major=128, block_k_major=128, block_k=128,
            sm_scale=scale, interpret=True)
  dk, dv = _bwd_dkv(q, k, v, l4, m4, do, di4, block_q=128, **kw)
  dq = _bwd_dq(q, k, v, l4, m4, do, di4, **kw)
  np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-4,
                             atol=1e-4)


def test_flash_composed_custom_vjp_interpret(rng):
  """jax.grad through the COMPOSED flash_attention custom_vjp (residual
  threading, di computation, slim kernels) in interpret mode must match the
  einsum path — the end-to-end CPU pin CLAUDE.md requires of Pallas ops."""
  from jax.experimental.pallas.ops.tpu import flash_attention as fa
  from mulan_tpu.ops.flash_bwd import flash_attention
  b, h, t, d = 2, 1, 256, 128
  scale = 1.0 / np.sqrt(d)
  r1, r2, r3, r4 = jax.random.split(rng, 4)
  q = jax.random.normal(r1, (b, h, t, d))
  k = jax.random.normal(r2, (b, h, t, d))
  v = jax.random.normal(r3, (b, h, t, d))
  do = jax.random.normal(r4, (b, h, t, d))
  sizes = fa.BlockSizes(
      block_q=128, block_k_major=256, block_k=128, block_b=1,
      block_q_major_dkv=128, block_k_major_dkv=256, block_k_dkv=128,
      block_q_dkv=128, block_k_major_dq=256, block_k_dq=128, block_q_dq=128)

  def loss_flash(q, k, v):
    return jnp.sum(flash_attention(q, k, v, scale, sizes, interpret=True) * do)

  def loss_ref(q, k, v):
    o, _, _ = _ref_attention_with_stats(q, k, v, scale)
    return jnp.sum(o * do)

  o = flash_attention(q, k, v, scale, sizes, interpret=True)
  o_ref, _, _ = _ref_attention_with_stats(q, k, v, scale)
  np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), rtol=1e-5,
                             atol=1e-5)
  grads = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
  for g, g_ref in zip(grads, grads_ref):
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-4)


def test_flash_bwd_rejects_non_dividing_blocks(rng):
  """Non-dividing block sizes must raise, not silently truncate the grid."""
  from mulan_tpu.ops.flash_bwd import _bwd_dkv
  b, h, t, d = 1, 1, 384, 128
  q = jnp.zeros((b, h, t, d))
  stats = jnp.zeros((b, h, t, 1))
  with pytest.raises(ValueError, match='divisible'):
    _bwd_dkv(q, q, q, stats, stats, q, stats, block_q_major=256, block_q=128,
             block_k_major=256, block_k=128, sm_scale=1.0, interpret=True)


def test_flash_bwd_slim_subblocks_match_autodiff(rng):
  """Same, with minor blocks smaller than majors (the fori_loop paths)."""
  from mulan_tpu.ops.flash_bwd import _bwd_dkv, _bwd_dq
  b, h, t, d = 1, 2, 512, 128
  scale = 0.17
  r1, r2, r3, r4 = jax.random.split(rng, 4)
  q = jax.random.normal(r1, (b, h, t, d))
  k = jax.random.normal(r2, (b, h, t, d))
  v = jax.random.normal(r3, (b, h, t, d))
  do = jax.random.normal(r4, (b, h, t, d))

  def loss(q, k, v):
    o, _, _ = _ref_attention_with_stats(q, k, v, scale)
    return jnp.sum(o * do)

  dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
  o, l, m = _ref_attention_with_stats(q, k, v, scale)
  di = jnp.sum(o * do.astype(jnp.float32), axis=-1)
  l4, m4, di4 = l[..., None], m[..., None], di[..., None]
  dk, dv = _bwd_dkv(q, k, v, l4, m4, do, di4, block_q_major=256, block_q=128,
                    block_k_major=512, block_k=128, sm_scale=scale,
                    interpret=True)
  dq = _bwd_dq(q, k, v, l4, m4, do, di4, block_q_major=128,
               block_k_major=512, block_k=256, sm_scale=scale,
               interpret=True)
  np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-4,
                             atol=1e-4)
