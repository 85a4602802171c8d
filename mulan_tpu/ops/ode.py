"""On-device adaptive Dormand-Prince 5(4) ODE solver.

The reference evaluates exact NLL by looping `scipy.integrate.solve_ivp`
(RK45, float64) on the HOST, paying a full host<->device round-trip per RHS
evaluation (/root/reference/ldm/notebook_utils.py:350-361). This solver runs
the same embedded Dormand-Prince pair entirely on device inside a
`lax.while_loop`, so the whole likelihood computation is ONE XLA program:
no transfers, jit-compatible, shardable across chips, batchable over
importance samples.

Design notes:
  * classic DoPri5 tableau with FSAL (first-same-as-last): 6 fresh RHS
    evaluations per accepted step;
  * error control matches scipy's RK45: err_norm = RMS over
    err / (atol + rtol * max(|y0|, |y1|)), accept when err_norm <= 1,
    step factor 0.9 * err^(-1/5) clipped to [0.2, 10] (scipy defaults);
  * one scalar error norm for the whole state (scipy semantics — the
    reference flattens the entire batch into one solve_ivp call, so the
    step size is shared across the batch there too);
  * float32 state. gamma-range-sensitive pieces inside the drift are the
    drift function's responsibility (see MuLAN.reverse_ode high_precision).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Dormand-Prince 5(4) Butcher tableau.
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B5 = _A[6, :7].copy()  # 5th-order solution weights (FSAL row)
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                -92097 / 339200, 187 / 2100, 1 / 40])
_E = _B5 - _B4  # error weights


class ODESolution(NamedTuple):
  y: jax.Array          # final state
  num_steps: jax.Array  # accepted steps
  num_rejected: jax.Array
  nfe: jax.Array        # RHS evaluations
  success: jax.Array    # False if max_steps was hit


def _rms_norm(x):
  return jnp.sqrt(jnp.mean(jnp.square(x)))


def odeint_dopri5(func: Callable, y0: jax.Array, t0: float, t1: float, *,
                  rtol: float = 1e-5, atol: float = 1e-5,
                  first_step: float = 0.01, max_steps: int = 10_000,
                  min_step: float = 1e-8) -> ODESolution:
  """Integrate dy/dt = func(t, y) from t0 to t1 (either direction).

  `y0` is a single flat-or-shaped float array; callers pack structured state
  (e.g. [z, delta_logp]) themselves.
  """
  y0 = jnp.asarray(y0, jnp.float32)
  direction = jnp.sign(jnp.float32(t1 - t0))
  span = jnp.abs(jnp.float32(t1 - t0))

  def rhs(t, y):
    return jnp.asarray(func(t, y), jnp.float32)

  class Carry(NamedTuple):
    t: jax.Array
    y: jax.Array
    h: jax.Array       # signed step size
    k_last: jax.Array  # FSAL: f(t, y)
    steps: jax.Array
    rejected: jax.Array
    nfe: jax.Array
    done: jax.Array
    failed: jax.Array

  def cond(c: Carry):
    return jnp.logical_not(jnp.logical_or(c.done, c.failed))

  def body(c: Carry):
    # Clip the step to land exactly on t1.
    remaining = t1 - c.t
    h = jnp.where(jnp.abs(c.h) > jnp.abs(remaining), remaining, c.h)

    k = [c.k_last]
    for i in range(1, 7):
      yi = c.y
      for j in range(i):
        if _A[i, j] != 0.0:
          yi = yi + h * jnp.float32(_A[i, j]) * k[j]
      k.append(rhs(c.t + jnp.float32(_C[i]) * h, yi))

    y1 = c.y
    for i in range(7):
      if _B5[i] != 0.0:
        y1 = y1 + h * jnp.float32(_B5[i]) * k[i]
    # FSAL: k[6] = f(t + h, y1) because the last stage IS the 5th-order
    # solution point.
    err = jnp.zeros_like(c.y)
    for i in range(7):
      if _E[i] != 0.0:
        err = err + h * jnp.float32(_E[i]) * k[i]

    scale = atol + rtol * jnp.maximum(jnp.abs(c.y), jnp.abs(y1))
    err_norm = _rms_norm(err / scale)
    accept = err_norm <= 1.0

    factor = jnp.where(
        err_norm == 0.0, 10.0,
        jnp.clip(0.9 * err_norm ** (-0.2), 0.2, 10.0))
    h_next = c.h * factor
    # Never shrink below min_step (guards infinite loops near stiff spots).
    h_next = direction * jnp.maximum(jnp.abs(h_next), min_step)

    t_new = jnp.where(accept, c.t + h, c.t)
    y_new = jnp.where(accept, y1, c.y)
    k_last = jnp.where(accept, k[6], c.k_last)
    done = direction * (t1 - t_new) <= 1e-12 * span
    steps = c.steps + jnp.where(accept, 1, 0)
    rejected = c.rejected + jnp.where(accept, 0, 1)
    failed = (steps + rejected) >= max_steps
    return Carry(t=t_new, y=y_new, h=h_next, k_last=k_last, steps=steps,
                 rejected=rejected, nfe=c.nfe + 6, done=done, failed=failed)

  t0f = jnp.float32(t0)
  k0 = rhs(t0f, y0)
  init = Carry(t=t0f, y=y0, h=direction * jnp.float32(first_step),
               k_last=k0, steps=jnp.int32(0), rejected=jnp.int32(0),
               nfe=jnp.int32(1), done=jnp.asarray(False),
               failed=jnp.asarray(False))
  out = jax.lax.while_loop(cond, body, init)
  return ODESolution(y=out.y, num_steps=out.steps,
                     num_rejected=out.rejected, nfe=out.nfe,
                     success=jnp.logical_not(out.failed))


def odeint_rk4(func: Callable, y0: jax.Array, t0: float, t1: float, *,
               num_steps: int = 128, **unused_tolerances) -> ODESolution:
  """Fixed-grid classic RK4 over `num_steps` equal steps.

  Throughput mode for the exact-NLL evaluator: NFE is exactly
  4 * num_steps regardless of schedule stiffness, so eval cost is a dial
  (the adaptive DoPri5 spends 1-3k NFE/solve at paper tolerances on
  trained schedules — docs/PERF.md). A `lax.scan` (static trip count)
  instead of DoPri5's `lax.while_loop`; rtol/atol are accepted and
  ignored so both solvers share a call signature.
  """
  del unused_tolerances
  y0 = jnp.asarray(y0, jnp.float32)
  h = jnp.float32(t1 - t0) / num_steps

  def rhs(t, y):
    return jnp.asarray(func(t, y), jnp.float32)

  def step(y, i):
    t = jnp.float32(t0) + i.astype(jnp.float32) * h
    k1 = rhs(t, y)
    k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
    k3 = rhs(t + 0.5 * h, y + 0.5 * h * k2)
    k4 = rhs(t + h, y + h * k3)
    return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

  y, _ = jax.lax.scan(step, y0, jnp.arange(num_steps))
  return ODESolution(y=y, num_steps=jnp.int32(num_steps),
                     num_rejected=jnp.int32(0),
                     nfe=jnp.int32(4 * num_steps),
                     success=jnp.asarray(True))
