"""Multi-step TRAINING-TRAJECTORY parity against the live reference.

tests/test_grad_parity.py proves one gradient evaluation matches; this file
proves N full optimizer+EMA steps match. The two frameworks build their
optimizers differently — the reference rebuilds the optax chain at the
current lr EVERY step (train_state.py:85-94, experiment.py:131-182) while
this framework bakes the lr schedule into one chain (train/state.py:4-8) —
and "identical math" was previously asserted, never demonstrated. Here both
sides start from transplanted-identical parameters, draw identical (frozen)
randomness, and at EVERY step: (a) each side differentiates its OWN ELBO
and the gradients must agree; (b) both sides run their own adamw(+clip)+EMA
update with a VARYING warmup lr on the SAME (reference) gradients; (c)
params AND ema_params must agree within fp32 tolerance. Sharing the
gradients in (b) is what makes (c) testable at fp precision — advancing
each side on its own gradients was tried first and decorrelates single
near-zero-gradient elements at full +-lr steps per step (adam normalizes
m/sqrt(v) to O(1) however tiny the gradient), regardless of optimizer-math
correctness; see _assert_grads_close for how (a) still pins the ELBO along
the whole trajectory.

Skipped when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parity_helpers import frozen_randomness

N_STEPS = 12
WARMUP = 8           # lr varies across most steps: 0 -> LR linearly
LR = 2e-3            # larger than the shipped 2e-4: drift must show
EMA_RATE = 0.99
CLIP_NORM = 1.0      # exercises the clip_by_global_norm chain link

CFG_KW = dict(
    vocab_size=256, antithetic_time_sampling=True,
    with_fourier_features=True, with_attention=False,
    gamma_type='poly_fixedend', gamma_min=-13.3, gamma_max=5.0,
    sm_n_timesteps=0, sm_n_embd=32, sm_n_layer=2, sm_pdrop=0.1,
    forward_n_layer=1, latent_size=10, latent_k=3, latent_type='topk',
    topk_noise_type='gamma', z_conditioning=True, reparam_type='true',
    encoder='unet', condition='input', unet_type='vdm')




def _assert_grads_close(ours, ref_mapped, *, step):
  """Per-step gradient parity (the tests/test_grad_parity.py tolerance
  form, applied at every point ALONG the trajectory, not just at init).
  The atol floor is tied to the GLOBAL gradient magnitude: a leaf whose
  entire gradient is <1% of the tree's largest (e.g. conv_in.bias, a
  cancellation sum at ~1e-6 absolute) is numerically zero — demanding
  per-leaf relative agreement on it compares fp summation noise. The atol
  factor is 2e-3 (vs test_grad_parity's init-time 2e-4): the shared
  trajectory accumulates ~1e-5-relative param drift that gradient
  sensitivity amplifies (measured ~5e-4 of leaf scale by step 9)."""
  flat_ours = jax.tree_util.tree_leaves_with_path(ours)
  flat_ref = {jax.tree_util.keystr(kp): v for kp, v in
              jax.tree_util.tree_leaves_with_path(ref_mapped)}
  assert len(flat_ours) == len(flat_ref)
  global_max = max(float(np.max(np.abs(np.asarray(v))))
                   for v in flat_ref.values())
  for kp, ours_leaf in flat_ours:
    name = jax.tree_util.keystr(kp)
    ref_leaf = np.asarray(flat_ref[name])
    scale = max(1e-3, 1e-2 * global_max, float(np.max(np.abs(ref_leaf))))
    np.testing.assert_allclose(
        np.asarray(ours_leaf), ref_leaf, rtol=2e-3, atol=2e-3 * scale,
        err_msg=f'gradient mismatch at step {step}, leaf {name}')


def _assert_states_close(ours, ref_mapped, *, step, what):
  """Optimizer/EMA-state parity at fp precision: both sides were advanced
  with the SAME gradients, so any deviation is optimizer MATH (lr schedule,
  decay mask, clip, adam accumulators, EMA), not fp noise."""
  flat_ours = jax.tree_util.tree_leaves_with_path(ours)
  flat_ref = {jax.tree_util.keystr(kp): v for kp, v in
              jax.tree_util.tree_leaves_with_path(ref_mapped)}
  assert len(flat_ours) == len(flat_ref)
  for kp, ours_leaf in flat_ours:
    name = jax.tree_util.keystr(kp)
    np.testing.assert_allclose(
        np.asarray(ours_leaf), np.asarray(flat_ref[name]),
        rtol=1e-5, atol=1e-9,
        err_msg=f'{what} mismatch at step {step}, leaf {name}')


def test_training_trajectories_match(monkeypatch):
  sys.path.insert(0, REFERENCE)
  # ldm.experiment imports ldm.dataset -> tensorflow_datasets/addons, which
  # this sandbox does not ship; the optimizer/lr factories under test never
  # touch them, so satisfy the imports with empty module stubs.
  from unittest import mock
  for name in ('tensorflow_datasets', 'tensorflow_addons'):
    if name not in sys.modules:
      stub = mock.MagicMock(name=name)
      # clu.deterministic_data parses tfds.version.__version__ at import
      # time and uses tfds.* in type annotations; MagicMock satisfies the
      # attribute walks, the version must be a real string.
      stub.version.__version__ = '4.9.0'
      sys.modules[name] = stub
  import ml_collections
  from ldm import experiment as ref_experiment
  from ldm import model_mulan_epsilon, model_vdm
  from ldm import train_state as ref_train_state
  from mulan_tpu.compat import convert_params
  from mulan_tpu.models import build_model
  from mulan_tpu.models.config import ModelConfig
  from mulan_tpu.train.optimizer import make_lr_schedule, make_optimizer
  from mulan_tpu.train.state import TrainState

  # --- identical starting parameters -------------------------------------
  ref_cfg = model_vdm.VDMConfig(sample_softmax=False, **CFG_KW)
  ref_model = model_mulan_epsilon.VDM(ref_cfg)
  r = jax.random.PRNGKey(0)
  ref_vars = ref_model.init(
      {'params': r, 'sample': jax.random.fold_in(r, 1)},
      images=jnp.zeros((2, 32, 32, 3), 'uint8'),
      labels=jnp.zeros((2,)), conditioning=jnp.zeros((2,)), step=-1.0)
  ours_model = build_model(
      'mulan_epsilon', ModelConfig(sample_softmax=False, image_size=32,
                                   **CFG_KW))
  our_params = convert_params(ref_vars['params'])

  # --- the reference's training machinery, called as-is ------------------
  # get_optimizer/get_lr_schedule read self.config only; a shim carries it
  # (calling the real reference methods — the per-step optimizer REBUILD at
  # the current lr, train_state.py:85-88 — is the point of this test).
  shim = type('Shim', (), {})()
  shim.config = ml_collections.ConfigDict(dict(
      optimizer=dict(name='adamw',
                     args=dict(b1=0.9, b2=0.99, eps=1e-8, weight_decay=0.01),
                     learning_rate=LR, lr_decay=False, ema_rate=EMA_RATE,
                     gradient_clip_norm=CLIP_NORM),
      training=dict(num_steps_lr_warmup=WARMUP, num_steps_train=10_000)))
  ref_tx_fn = lambda lr: ref_experiment.Experiment.get_optimizer(shim, lr)  # noqa: E731
  ref_lr = ref_experiment.Experiment.get_lr_schedule(shim)
  import flax
  # the reference trains on FrozenDict params (its optax.masked masks are
  # frozen, experiment.py:150-152); keep its side frozen end-to-end
  ref_state = ref_train_state.TrainState.create(
      apply_fn=ref_model.apply,
      variables={'params': flax.core.freeze(ref_vars['params'])},
      optax_optimizer=ref_tx_fn)

  # --- this framework's training machinery --------------------------------
  lr_schedule = make_lr_schedule(LR, WARMUP, 10_000, False)
  tx = make_optimizer(dict(name='adamw',
                           args=dict(b1=0.9, b2=0.99, eps=1e-8,
                                     weight_decay=0.01),
                           gradient_clip_norm=CLIP_NORM),
                      lr_schedule)
  our_state = TrainState.create(apply_fn=ours_model.apply, params=our_params,
                                tx=tx)

  # the reference's EMA update calls the jax.tree_map alias removed in
  # newer jax (train_state.py:95); restore it for the reference code path
  monkeypatch.setattr(jax, 'tree_map', jax.tree.map, raising=False)

  # --- identical data + frozen randomness ---------------------------------
  frozen_randomness(monkeypatch)
  batch = 4
  rs = np.random.RandomState(11)
  images = jnp.asarray(rs.randint(0, 256, (batch, 32, 32, 3)), 'uint8')
  labels = jnp.zeros((batch,), 'int32')
  conditioning = jnp.zeros((batch,))
  rngs = {'sample': jax.random.PRNGKey(123)}  # consumed by patched draws
  t = jnp.mod(0.375 + jnp.arange(0.0, 1.0, step=1.0 / batch), 1.0)

  def ref_loss(p):
    out = ref_model.apply({'params': p}, images=images, labels=labels,
                          conditioning=conditioning, step=100.0,
                          deterministic=True, rngs=rngs)
    return jnp.sum(out.loss_recon + out.loss_klz + out.loss_diff)

  def our_loss(p):
    out = ours_model.apply({'params': p}, images=images, labels=labels,
                           conditioning=conditioning, step=100.0, t=t,
                           deterministic=True, rngs=rngs,
                           method=ours_model.elbo)
    return jnp.sum(out.loss_recon + out.loss_klz + out.loss_diff)

  ref_grad = jax.jit(jax.grad(ref_loss))
  our_grad = jax.jit(jax.grad(our_loss))

  for step in range(N_STEPS):
    g_ref = ref_grad(ref_state.params)
    g_ours = our_grad(our_state.params)
    # (a) gradient parity at THIS point of the trajectory — the
    # well-conditioned comparison (each side differentiates its OWN ELBO).
    _assert_grads_close(g_ours, convert_params(g_ref), step=step)
    # (b) advance BOTH sides with the reference's gradient. Advancing each
    # on its own gradient was tried first and is NOT testable elementwise:
    # adam normalizes near-zero-gradient elements (m/sqrt(v) ~ O(1) however
    # tiny g is), so fp-level gradient differences between the two ELBO
    # implementations random-walk single elements apart at full +-lr steps
    # (measured: ~0.5 lr-steps apart by step 2, RMS decorrelation a few %
    # of movement per step) regardless of optimizer-math correctness.
    # Shared gradients make (c) an exact-math comparison of the optimizer
    # chains themselves: the reference rebuilds its optimizer at the
    # current lr every step (experiment.py:343-345, train_state.py:85-94),
    # ours bakes the schedule into one optax chain — identical math is the
    # claim under test.
    lr_now = float(ref_lr(ref_state.step))
    ref_state = ref_state.apply_gradients(
        grads=g_ref, lr=lr_now, ema_rate=EMA_RATE)
    our_state = our_state.apply_gradients(grads=convert_params(g_ref),
                                          ema_rate=EMA_RATE)
    # (c) params AND ema_params agree to fp precision at EVERY step.
    _assert_states_close(our_state.params, convert_params(ref_state.params),
                         step=step, what='params')
    _assert_states_close(our_state.ema_params,
                         convert_params(ref_state.ema_params),
                         step=step, what='ema_params')

  # the trajectory genuinely moved (not a vacuous all-zeros comparison)
  moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                       our_state.params, our_params)
  assert max(jax.tree.leaves(moved)) > 1e-4
