"""Numerics tests for the noise-schedule networks.

Covers the SURVEY.md 'hard parts': endpoint pinning, monotonicity, and exact
agreement of the analytic dgamma/dt with jax.jvp through the schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu.models.config import ModelConfig
from mulan_tpu.models.schedules import (MULAN_SCHEDULES, SCALAR_SCHEDULES,
                                        NoiseSchedulePolynomialFixedend)


def _init_schedule(cls, cfg, rng, *args):
  mod = cls(cfg)
  params = mod.init(rng, *args)
  return mod, params


class TestPolynomialFixedend:

  @pytest.fixture
  def setup(self, tiny_config, rng):
    mod = NoiseSchedulePolynomialFixedend(tiny_config)
    emb = jax.random.normal(rng, (4, tiny_config.latent_size))
    params = mod.init(rng, emb, jnp.zeros((4,)))
    return mod, params, emb, tiny_config

  def test_endpoints_pinned(self, setup):
    mod, params, emb, cfg = setup
    g0 = mod.apply(params, emb, jnp.zeros((4,)))
    g1 = mod.apply(params, emb, jnp.ones((4,)))
    np.testing.assert_allclose(g0, cfg.gamma_min, rtol=0, atol=1e-5)
    np.testing.assert_allclose(g1, cfg.gamma_max, rtol=0, atol=1e-4)

  def test_monotone_in_t(self, setup):
    mod, params, emb, _ = setup
    ts = jnp.linspace(0.0, 1.0, 64)
    emb1 = jnp.tile(emb[:1], (64, 1))
    g = mod.apply(params, emb1, ts)  # (64, n_pixels)
    diffs = jnp.diff(g, axis=0)
    assert (diffs >= -1e-5).all()

  def test_analytic_grad_matches_jvp(self, setup):
    mod, params, emb, _ = setup
    t = jnp.array([0.1, 0.33, 0.5, 0.99])
    g_a, dg_a = mod.apply(params, emb, t, method=mod.gamma_and_dgamma)
    g_j, dg_j = jax.jvp(
        lambda tt: mod.apply(params, emb, tt), (t,), (jnp.ones_like(t),))
    np.testing.assert_allclose(g_a, g_j, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dg_a, dg_j, rtol=1e-4, atol=1e-5)

  def test_elbo_gammas_match_separate_calls(self, setup):
    mod, params, emb, _ = setup
    t = jnp.array([0.2, 0.4, 0.6, 0.8])
    g0, g1, gt, dgt = mod.apply(params, emb, t, method=mod.elbo_gammas)
    g0_ref = mod.apply(params, emb, jnp.zeros_like(t))
    g1_ref = mod.apply(params, emb, jnp.ones_like(t))
    gt_ref, dgt_ref = mod.apply(params, emb, t, method=mod.gamma_and_dgamma)
    np.testing.assert_allclose(g0, g0_ref, atol=1e-5)
    np.testing.assert_allclose(g1, g1_ref, atol=1e-4)
    np.testing.assert_allclose(gt, gt_ref, rtol=1e-6)
    np.testing.assert_allclose(dgt, dgt_ref, rtol=1e-6)

  def test_integral_matches_numerical_quadrature(self, setup):
    """gamma is gmin + span * int_0^t (a u^2 + b u + c)^2 du / P(1)."""
    mod, params, emb, cfg = setup
    t_val = 0.7
    g = mod.apply(params, emb[:1], jnp.array([t_val]))
    # numerical quadrature of the derivative
    us = np.linspace(0, t_val, 20001)
    emb_rep = jnp.tile(emb[:1], (len(us), 1))
    _, dg = mod.apply(params, emb_rep, jnp.asarray(us),
                      method=mod.gamma_and_dgamma)
    integral = np.trapezoid(np.asarray(dg), us, axis=0)
    np.testing.assert_allclose(
        np.asarray(g[0]), cfg.gamma_min + integral, rtol=1e-4, atol=1e-3)

  def test_inverse_sampling_shapes_and_range(self, setup):
    mod, params, emb, _ = setup
    targets = jnp.array([0.0, 0.25, 0.5, 1.0])
    new_t, scale = mod.apply(params, emb, targets,
                             method=mod.inverse_sampling)
    assert new_t.shape == targets.shape
    assert scale.shape == (emb.shape[0],)
    assert (new_t >= 0).all() and (new_t <= 1).all()
    # inverse of target 0 / 1 are the endpoints
    assert float(new_t[0]) == 0.0
    assert float(new_t[3]) == 1.0


@pytest.mark.parametrize('name', ['linear', 'learnable_nnet'])
def test_other_mulan_schedules(name, tiny_config, rng):
  mod = MULAN_SCHEDULES[name](tiny_config)
  emb = jax.random.uniform(rng, (3, tiny_config.latent_size))
  t = jnp.array([0.1, 0.5, 0.9])
  params = mod.init(rng, emb, t)
  g = mod.apply(params, emb, t)
  assert g.shape == (3, tiny_config.n_pixels)
  g_a, dg_a = mod.apply(params, emb, t, method=mod.gamma_and_dgamma)
  g_j, dg_j = jax.jvp(lambda tt: mod.apply(params, emb, tt),
                      (t,), (jnp.ones_like(t),))
  np.testing.assert_allclose(g_a, g_j, rtol=1e-6)
  np.testing.assert_allclose(dg_a, dg_j, rtol=1e-5, atol=1e-6)
  # monotone in t (both schedules are monotone by construction)
  ts = jnp.linspace(0, 1, 32)
  gs = mod.apply(params, jnp.tile(emb[:1], (32, 1)), ts)
  assert (jnp.diff(gs, axis=0) >= -1e-5).all()


@pytest.mark.parametrize('name', list(SCALAR_SCHEDULES))
def test_scalar_schedules(name, tiny_config, rng):
  mod = SCALAR_SCHEDULES[name](tiny_config)
  t = jnp.array([0.0, 0.5, 1.0])
  params = mod.init(rng, t)
  g = mod.apply(params, t)
  assert g.shape == (3,)
  # gamma_and_dgamma agrees with jvp
  g_a, dg_a = mod.apply(params, t, method=mod.gamma_and_dgamma)
  g_j, dg_j = jax.jvp(lambda tt: mod.apply(params, tt), (t,),
                      (jnp.ones_like(t),))
  np.testing.assert_allclose(g_a, g_j, rtol=1e-6)
  np.testing.assert_allclose(dg_a, dg_j, rtol=1e-5, atol=1e-6)
  # linear-ish init: endpoints near (gamma_min, gamma_max)
  if name in ('learnable_scalar', 'fixed'):
    np.testing.assert_allclose(g[0], tiny_config.gamma_min, atol=1e-5)
    np.testing.assert_allclose(g[2], tiny_config.gamma_max, atol=1e-5)
