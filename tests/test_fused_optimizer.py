"""Fused flat-vector adamw vs the optax two-group reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu.train.optimizer import make_lr_schedule, make_optimizer

ARGS = {'b1': 0.9, 'b2': 0.99, 'eps': 1e-8, 'weight_decay': 0.01}


@pytest.fixture
def params(rng):
  ks = jax.random.split(rng, 6)
  return {
      'score_model': {
          'conv': {'kernel': jax.random.normal(ks[0], (3, 3, 4, 8)),
                   'bias': jax.random.normal(ks[1], (8,))}},
      'gamma': {
          'dense_1': {'kernel': jax.random.normal(ks[2], (5, 7)),
                      'bias': jax.random.normal(ks[3], (7,))}},
      'encoder_model': {
          'd': {'kernel': jax.random.normal(ks[4], (6, 3))}},
  }


@pytest.mark.parametrize('gamma_scale', [1.0, 0.5])
def test_fused_matches_optax_chain(params, rng, gamma_scale):
  schedule = make_lr_schedule(2e-4, 3, 100, lr_decay=True)
  cfg = {'name': 'adamw', 'args': ARGS}
  tx_ref = make_optimizer({**cfg, 'fused': False}, schedule,
                          gamma_lr_scale=gamma_scale)
  tx_fused = make_optimizer({**cfg, 'fused': True}, schedule,
                            gamma_lr_scale=gamma_scale)

  s_ref = tx_ref.init(params)
  s_fused = tx_fused.init(params)
  p_ref = params
  p_fused = jax.tree.map(jnp.copy, params)
  import optax
  for step in range(5):
    grads = jax.tree.map(
        lambda x: jax.random.normal(jax.random.fold_in(rng, step), x.shape),
        params)
    u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
    u_fused, s_fused = tx_fused.update(grads, s_fused, p_fused)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-9),
        u_ref, u_fused)
    p_ref = optax.apply_updates(p_ref, u_ref)
    p_fused = optax.apply_updates(p_fused, u_fused)


def test_fused_clip_norm(params):
  schedule = make_lr_schedule(1e-3, 0, 10, lr_decay=False)
  cfg = {'name': 'adamw', 'args': ARGS, 'gradient_clip_norm': 1e-3}
  tx_ref = make_optimizer({**cfg, 'fused': False}, schedule)
  tx_fused = make_optimizer({**cfg, 'fused': True}, schedule)
  grads = jax.tree.map(lambda x: jnp.ones_like(x) * 100.0, params)
  u_ref, _ = tx_ref.update(grads, tx_ref.init(params), params)
  u_fused, _ = tx_fused.update(grads, tx_fused.init(params), params)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-10),
      u_ref, u_fused)


def test_fused_bias_not_decayed(params):
  """With zero grads the only update source is weight decay; biases must not
  move, kernels must."""
  schedule = make_lr_schedule(1e-2, 0, 10, lr_decay=False)
  tx = make_optimizer({'name': 'adamw', 'args': ARGS, 'fused': True},
                      schedule)
  grads = jax.tree.map(jnp.zeros_like, params)
  updates, _ = tx.update(grads, tx.init(params), params)
  assert np.all(np.asarray(updates['score_model']['conv']['bias']) == 0.0)
  assert np.any(np.asarray(updates['score_model']['conv']['kernel']) != 0.0)


@pytest.mark.parametrize('gamma_scale', [1.0, 0.5])
def test_stacked_matches_optax_chain(params, rng, gamma_scale):
  """Shape-stacked adamw (one update per (shape,dtype,decay,lr) group) is
  numerically the optax two-group chain."""
  schedule = make_lr_schedule(2e-4, 3, 100, lr_decay=True)
  cfg = {'name': 'adamw', 'args': ARGS}
  tx_ref = make_optimizer({**cfg}, schedule, gamma_lr_scale=gamma_scale)
  tx_stk = make_optimizer({**cfg, 'stacked': True}, schedule,
                          gamma_lr_scale=gamma_scale)

  s_ref = tx_ref.init(params)
  s_stk = tx_stk.init(params)
  p_ref = params
  p_stk = jax.tree.map(jnp.copy, params)
  import optax
  for step in range(5):
    grads = jax.tree.map(
        lambda x: jax.random.normal(jax.random.fold_in(rng, step), x.shape),
        params)
    u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
    u_stk, s_stk = tx_stk.update(grads, s_stk, p_stk)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-9),
        u_ref, u_stk)
    p_ref = optax.apply_updates(p_ref, u_ref)
    p_stk = optax.apply_updates(p_stk, u_stk)


def test_stacked_groups_same_shapes():
  """Leaves of one shape collapse into one stacked state tensor."""
  from mulan_tpu.train.optimizer import make_stacked_adamw
  params = {'score_model': {f'block_{i}': {'kernel': jnp.ones((3, 3, 4, 4)),
                                           'bias': jnp.zeros((4,))}
                            for i in range(7)}}
  tx = make_stacked_adamw(ARGS, lambda _: 1e-3)
  state = tx.init(params)
  # two groups: 7x kernels stacked + 7x biases stacked
  assert len(state.mu) == 2
  assert {m.shape for m in state.mu} == {(7, 4), (7, 3, 3, 4, 4)}


def test_stacked_clip_norm(params):
  schedule = make_lr_schedule(1e-3, 0, 10, lr_decay=False)
  cfg = {'name': 'adamw', 'args': ARGS, 'gradient_clip_norm': 1e-3}
  tx_ref = make_optimizer({**cfg}, schedule)
  tx_stk = make_optimizer({**cfg, 'stacked': True}, schedule)
  grads = jax.tree.map(lambda x: jnp.ones_like(x) * 100.0, params)
  u_ref, _ = tx_ref.update(grads, tx_ref.init(params), params)
  u_stk, _ = tx_stk.update(grads, tx_stk.init(params), params)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-10),
      u_ref, u_stk)
