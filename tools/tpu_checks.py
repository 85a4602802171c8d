"""On-TPU kernel validation suite (run on the real chip; not a pytest file).

CPU tests validate the SEMANTICS of the Pallas paths via fallbacks/interpret
mode, but cannot catch bugs in the TPU kernels themselves (e.g. the
hardware-PRNG block striping in ops/dropout.py, or Mosaic lowering of the
flash-attention / decoder kernels). This script runs statistical and parity
checks on real hardware and prints one PASS/FAIL JSON line per check —
recorded in docs/PERF.md each round.

  python tools/tpu_checks.py
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)


import json

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


def check(name, ok, **info):
  RESULTS.append(ok)
  print(json.dumps({'check': name, 'ok': bool(ok),
                    **{k: float(v) for k, v in info.items()}}))


def check_dropout_statistics():
  from mulan_tpu.ops.dropout import hw_dropout, _hw_mask

  rate = 0.1
  shape = (128, 32, 32, 128)  # flagship activation shape
  seed = jnp.int32(12345)
  mask = np.asarray(
      jax.jit(lambda s: _hw_mask(s, shape, rate, jnp.bfloat16))(seed),
      np.float32)

  # the kernel emits the scale rounded to the mask dtype (bf16)
  scale = float(jnp.asarray(1.0 / (1.0 - rate), jnp.bfloat16))
  keep = mask / scale
  assert set(np.unique(keep)).issubset({0.0, 1.0}), np.unique(keep)

  # Global keep fraction: n = 128*32*32*128 = 16.7M draws; binomial std of
  # the mean is ~7e-5, so a 1e-3 window is ~13 sigma yet catches any real
  # rate bug.
  frac = keep.mean()
  check('dropout_keep_fraction', abs(frac - (1 - rate)) < 1e-3, frac=frac)

  # Per-block striping: the kernel seeds each grid block with
  # seed + program_id; a striping bug (e.g. reused bits across blocks) shows
  # up as per-block keep rates far from the mean or as identical blocks.
  flat = keep.reshape(-1, 128)
  n_blocks = 8
  rows_per_block = flat.shape[0] // n_blocks
  block_fracs = flat[:n_blocks * rows_per_block].reshape(
      n_blocks, -1).mean(axis=1)
  check('dropout_block_uniformity',
        np.all(np.abs(block_fracs - (1 - rate)) < 3e-3),
        worst=float(np.max(np.abs(block_fracs - (1 - rate)))))
  block_bits = flat[:n_blocks * rows_per_block].reshape(n_blocks, -1)
  dup = max(
      float((block_bits[i] == block_bits[j]).mean())
      for i in range(n_blocks) for j in range(i + 1, n_blocks))
  # Independent blocks agree on ~ p^2 + (1-p)^2 of positions; identical
  # blocks (bit reuse) would agree on 100%.
  expected_agree = rate ** 2 + (1 - rate) ** 2
  check('dropout_blocks_decorrelated', dup < expected_agree + 0.01,
        max_agreement=dup, expected=expected_agree)

  # Backward regenerates the SAME mask from the seed.
  x = jnp.ones(shape, jnp.bfloat16)
  fwd = jax.jit(lambda xx: hw_dropout(xx, seed, rate))(x)
  grad = jax.jit(jax.grad(lambda xx: hw_dropout(xx, seed, rate).astype(
      jnp.float32).sum()))(x)
  check('dropout_bwd_mask_identity',
        np.array_equal(np.asarray(fwd, np.float32),
                       np.asarray(grad, np.float32)))

  # Different seeds decorrelate.
  mask2 = np.asarray(
      jax.jit(lambda s: _hw_mask(s, shape, rate, jnp.bfloat16))(
          jnp.int32(54321)), np.float32) / scale
  agree = float((keep == mask2).mean())
  check('dropout_seeds_decorrelated', abs(agree - expected_agree) < 5e-3,
        agreement=agree, expected=expected_agree)

  # Batched mask generation (config.dropout_mask_batch): per-slot keep rate
  # and cross-slot decorrelation from ONE kernel launch.
  from mulan_tpu.ops.dropout import hw_mask_batch
  mb = np.asarray(
      jax.jit(lambda s: hw_mask_batch(s, 4, (16, 32, 32, 128), rate,
                                      jnp.bfloat16))(seed),
      np.float32) / scale
  slot_fracs = mb.reshape(4, -1).mean(axis=1)
  check('dropout_batch_slot_uniformity',
        np.all(np.abs(slot_fracs - (1 - rate)) < 3e-3),
        worst=float(np.max(np.abs(slot_fracs - (1 - rate)))))
  slot_agree = max(
      float((mb[i] == mb[j]).mean())
      for i in range(4) for j in range(i + 1, 4))
  check('dropout_batch_slots_decorrelated',
        slot_agree < expected_agree + 0.01, max_agreement=slot_agree,
        expected=expected_agree)


def check_flash_attention_parity():
  from mulan_tpu.models.layers import AttnBlock

  b, h, w, c = 8, 32, 32, 128
  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(rng, (b, h, w, c), jnp.float32)
  ref_block = AttnBlock(dtype=jnp.bfloat16, use_pallas=False)
  fast_block = AttnBlock(dtype=jnp.bfloat16, use_pallas=True)
  params = ref_block.init(jax.random.PRNGKey(1), x)
  # zero-init proj_out makes the block an identity; perturb so outputs and
  # grads are non-trivial.
  params = jax.tree.map(
      lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(2), p.shape,
                                             p.dtype), params)

  def loss(block, p, xx):
    return (block.apply(p, xx).astype(jnp.float32) ** 2).mean()

  ref_out = jax.jit(lambda p, xx: ref_block.apply(p, xx))(params, x)
  fast_out = jax.jit(lambda p, xx: fast_block.apply(p, xx))(params, x)
  err = float(jnp.max(jnp.abs(ref_out - fast_out)))
  scale_ref = float(jnp.max(jnp.abs(ref_out)))
  check('flash_attention_fwd_parity', err < 0.02 * max(scale_ref, 1.0),
        max_abs_err=err, out_scale=scale_ref)

  g_ref = jax.jit(jax.grad(lambda p, xx: loss(ref_block, p, xx)))(params, x)
  g_fast = jax.jit(jax.grad(lambda p, xx: loss(fast_block, p, xx)))(params,
                                                                    x)
  # Regularize per-leaf scale: k/bias's TRUE gradient is ~0 (adding a
  # constant to k shifts every logit of a query equally — softmax
  # invariant), so a bare per-leaf relative error explodes on noise.
  floor = 1e-2 * max(float(jnp.max(jnp.abs(g)))
                     for g in jax.tree.leaves(g_ref))
  errs = jax.tree.map(
      lambda a, b: float(jnp.max(jnp.abs(a - b))
                         / (jnp.max(jnp.abs(a)) + floor)), g_ref, g_fast)
  worst = max(jax.tree.leaves(errs))
  check('flash_attention_grad_parity', worst < 0.05, worst_rel_err=worst)


def check_decoder_kernel_parity():
  from mulan_tpu.models.encdec import logprob as logprob_streamed
  from mulan_tpu.ops.decoder_logprob import decoder_logprob

  rng = jax.random.PRNGKey(3)
  r1, r2, r3 = jax.random.split(rng, 3)
  b = 12  # deliberately not a multiple of 8 (Mosaic padding path)
  x = jax.random.randint(r1, (b, 32, 32, 3), 0, 256).astype(jnp.float32)
  z = jax.random.normal(r2, (b, 32, 32, 3))
  g0 = -13.3 + 2.0 * jax.random.uniform(r3, (b, 32, 32, 3))

  fast = jax.jit(decoder_logprob)(x, z, g0)
  ref = jax.jit(lambda *a: logprob_streamed(*a, 256))(x, z, g0)
  err = float(jnp.max(jnp.abs(fast - ref) / (jnp.abs(ref) + 1e-3)))
  check('decoder_logprob_fwd_parity', err < 1e-4, max_rel_err=err)

  def f_fast(zz, gg):
    return decoder_logprob(x, zz, gg).sum()

  def f_ref(zz, gg):
    return logprob_streamed(x, zz, gg, 256).sum()

  gz_fast, gg_fast = jax.jit(jax.grad(f_fast, argnums=(0, 1)))(z, g0)
  gz_ref, gg_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(z, g0)
  # grads scale with exp(-gamma_0) ~ 6e5 at gamma_min; compare RELATIVE
  errz = float(jnp.max(jnp.abs(gz_fast - gz_ref))
               / jnp.max(jnp.abs(gz_ref)))
  errg = float(jnp.max(jnp.abs(gg_fast - gg_ref))
               / jnp.max(jnp.abs(gg_ref)))
  check('decoder_logprob_grad_parity', errz < 1e-4 and errg < 1e-4,
        rel_err_z=errz, rel_err_g=errg)


def check_gamma_precision():
  """Value+gradient error of the gamma schedule MLP at
  gamma_precision='high' (3-pass bf16 MXU) vs 'highest' (6-pass, exact-f32)
  — the evidence gate for flipping the config default (docs/NEXT.md item 3:
  the fp32-gamma invariant demands storage/accumulation stay f32; 'high'
  keeps both and only drops 3 of the 6 mantissa cross-products)."""
  import dataclasses

  from mulan_tpu.models.config import ModelConfig
  from mulan_tpu.models.schedules import NoiseSchedulePolynomialFixedend

  cfg = ModelConfig()  # flagship geometry: latent 50 -> 3072 MLP
  rng = jax.random.PRNGKey(7)
  emb = jax.random.normal(rng, (64, cfg.latent_size))
  t = jax.random.uniform(jax.random.fold_in(rng, 1), (64,))

  results = {}
  for prec in ('highest', 'high'):
    sched = NoiseSchedulePolynomialFixedend(
        config=dataclasses.replace(cfg, gamma_precision=prec))
    params = sched.init(jax.random.PRNGKey(0), emb, t)
    # non-trivial coefficients (dense_out_a is zero-init)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                               p.shape, p.dtype), params)

    def loss(p, sched=sched):
      g0, g1, gt, dgt = sched.apply(p, emb, t, method=sched.elbo_gammas)
      return (gt ** 2).mean() + (dgt ** 2).mean(), (gt, dgt)

    (l, (gt, dgt)), grads = jax.jit(
        jax.value_and_grad(loss, has_aux=True))(params)
    results[prec] = (np.asarray(gt, np.float64), np.asarray(dgt, np.float64),
                     jax.tree.map(lambda g: np.asarray(g, np.float64), grads))

  gt_hi, dgt_hi, g_hi = results['highest']
  gt_lo, dgt_lo, g_lo = results['high']
  # gamma spans [-13.3, 5]; compare absolute error against the span
  gt_err = float(np.max(np.abs(gt_hi - gt_lo))) / 18.3
  dgt_err = float(np.max(np.abs(dgt_hi - dgt_lo))
                  / (np.max(np.abs(dgt_hi)) + 1e-9))
  grad_err = max(
      float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
      for a, b in zip(jax.tree.leaves(g_hi), jax.tree.leaves(g_lo)))
  # MEASURED (v5e, 2026-08-17): gamma span err 2.0e-3, dgamma 9.5e-4,
  # grad 1.6e-3 — bf16x3 is NOT f32-equivalent at 3072-wide contractions,
  # so the flip gate (1e-4) FAILS and the config default stays 'highest'
  # (the fp32-gamma invariant holds; the ~2.5-3 ms/step is not free).
  # The check itself passes iff the errors sit in the expected bf16x3 band
  # (a wiring bug would blow past 5e-3); `flip_approved` carries the gate.
  in_band = gt_err < 5e-3 and dgt_err < 5e-3 and grad_err < 5e-3
  approved = gt_err < 1e-4 and dgt_err < 1e-4 and grad_err < 1e-3
  check('gamma_precision_high_band', in_band,
        gamma_rel_span_err=gt_err, dgamma_rel_err=dgt_err,
        grad_rel_err=grad_err, flip_approved=float(approved))


def main():
  backend = jax.default_backend()
  if backend != 'tpu':
    print(json.dumps({'check': 'backend', 'ok': False,
                      'error': f'needs TPU, got {backend}'}))
    sys.exit(2)
  check_dropout_statistics()
  check_flash_attention_parity()
  check_decoder_kernel_parity()
  check_gamma_precision()
  ok = all(RESULTS)
  print(json.dumps({'check': 'ALL', 'ok': ok, 'n': len(RESULTS)}))
  sys.exit(0 if ok else 1)


if __name__ == '__main__':
  main()
