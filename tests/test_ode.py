"""On-device Dormand-Prince / fixed-grid RK4 solvers vs closed forms and
scipy RK45."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from mulan_tpu.ops.ode import odeint_dopri5, odeint_rk4


def test_exponential_decay():
  sol = odeint_dopri5(lambda t, y: -y, jnp.ones(4), 0.0, 1.0,
                      rtol=1e-6, atol=1e-8)
  assert bool(sol.success)
  np.testing.assert_allclose(np.asarray(sol.y), np.exp(-1.0), rtol=1e-5)


def test_reverse_time_integration():
  # dy/dt = y integrated from 1 -> 0: y(0) = y(1) * exp(-1)
  sol = odeint_dopri5(lambda t, y: y, jnp.full((3,), 2.0), 1.0, 0.0,
                      rtol=1e-6, atol=1e-8)
  assert bool(sol.success)
  np.testing.assert_allclose(np.asarray(sol.y), 2.0 * np.exp(-1.0),
                             rtol=1e-5)


def test_matches_scipy_on_nonlinear_ode():
  """Van-der-Pol-ish nonlinear RHS, compare against scipy solve_ivp RK45 at
  the same tolerances (the reference's solver, notebook_utils.py:361)."""
  a = np.linspace(0.5, 1.5, 8).astype(np.float32)

  def rhs_np(t, y):
    return np.sin(3 * t) * y - 0.5 * y ** 3 + a

  def rhs_jax(t, y):
    return jnp.sin(3 * t) * y - 0.5 * y ** 3 + jnp.asarray(a)

  y0 = np.linspace(-1, 1, 8).astype(np.float32)
  ref = integrate.solve_ivp(rhs_np, (0, 1), y0, rtol=1e-5, atol=1e-5,
                            method='RK45')
  got = odeint_dopri5(rhs_jax, jnp.asarray(y0), 0.0, 1.0,
                      rtol=1e-5, atol=1e-5)
  assert bool(got.success)
  np.testing.assert_allclose(np.asarray(got.y), ref.y[:, -1], rtol=1e-3,
                             atol=1e-4)


def test_jit_and_grad_compatible():
  @jax.jit
  def solve(y0):
    return odeint_dopri5(lambda t, y: -2.0 * y, y0, 0.0, 1.0).y

  y = solve(jnp.ones(2))
  np.testing.assert_allclose(np.asarray(y), np.exp(-2.0), rtol=1e-4)


def test_step_budget_failure_flag():
  sol = odeint_dopri5(lambda t, y: -y, jnp.ones(2), 0.0, 1.0, max_steps=2,
                      rtol=1e-10, atol=1e-12, first_step=1e-6)
  assert not bool(sol.success)


def test_stats_are_sane():
  sol = odeint_dopri5(lambda t, y: -y, jnp.ones(2), 0.0, 1.0)
  assert int(sol.nfe) >= 6 * int(sol.num_steps)
  assert int(sol.num_steps) >= 1


def test_rk4_exponential_decay_and_stats():
  sol = odeint_rk4(lambda t, y: -y, jnp.ones(4), 0.0, 1.0, num_steps=64)
  assert bool(sol.success)
  assert int(sol.nfe) == 4 * 64
  np.testing.assert_allclose(np.asarray(sol.y), np.exp(-1.0), rtol=1e-6)


def test_rk4_reverse_time():
  sol = odeint_rk4(lambda t, y: y, jnp.full((3,), 2.0), 1.0, 0.0,
                   num_steps=64)
  np.testing.assert_allclose(np.asarray(sol.y), 2.0 * np.exp(-1.0),
                             rtol=1e-6)


def test_rk4_fourth_order_convergence():
  """Halving the step size shrinks the global error ~16x (order 4)."""
  def rhs(t, y):
    return jnp.sin(3 * t) * y - 0.5 * y ** 3

  y0 = jnp.asarray(np.linspace(-1, 1, 8), jnp.float32)
  exact = np.asarray(odeint_dopri5(rhs, y0, 0.0, 1.0,
                                   rtol=1e-8, atol=1e-10).y, np.float64)
  errs = []
  for n in (8, 16, 32):
    got = np.asarray(odeint_rk4(rhs, y0, 0.0, 1.0, num_steps=n).y,
                     np.float64)
    errs.append(np.max(np.abs(got - exact)))
  assert errs[0] / errs[1] > 8, errs   # fp32 noise floor softens the 16x
  assert errs[1] / errs[2] > 4, errs


def test_rk4_accepts_and_ignores_tolerances():
  """rk4 shares the dopri5 call signature so the evaluator can inject
  either solver unchanged."""
  sol = odeint_rk4(lambda t, y: -y, jnp.ones(2), 0.0, 1.0, num_steps=32,
                   rtol=1e-5, atol=1e-5, max_steps=5000, first_step=0.01)
  assert bool(sol.success)
