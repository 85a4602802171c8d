"""ODE-NLL tolerance sweep on a TRAINED model.

The solver-parity test in test_evals.py runs at a near-random checkpoint; a
trained poly_fixedend schedule is much stiffer (gamma spans e^gamma_min).
Here a tiny model is actually trained in-test (~1.5k optimizer steps), then
the SAME likelihood computation (same dequantization / Hutchinson draws —
the solver is injected, everything else is shared code) is evaluated with

  * the on-device float32 DoPri5 solver at rtol/atol 1e-3, 1e-4, 1e-5, and
  * the reference architecture: host-side scipy RK45 in float64
    (/root/reference/ldm/notebook_utils.py:350-361) at 1e-6,

and the resulting BPDs must agree within the 0.01-BPD parity budget
(SURVEY.md section 7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from mulan_tpu.configs import tiny_synthetic
from mulan_tpu.data import create_one_time_eval_dataset
from mulan_tpu.evals.nll_ode import bpd_offset, make_ode_likelihood_fn
from mulan_tpu.ops.ode import ODESolution


def scipy_odeint(func, y0, t0, t1, *, rtol, atol, max_steps, first_step):
  """Drop-in odeint with scipy RK45 in float64 on the host."""
  f_jit = jax.jit(func)
  shape = jnp.shape(y0)
  nfev = [0]

  def f(t, y):
    nfev[0] += 1
    fy = f_jit(jnp.float32(t), jnp.asarray(y, jnp.float32).reshape(shape))
    return np.asarray(fy, np.float64).reshape(-1)

  sol = integrate.solve_ivp(
      f, (t0, t1), np.asarray(y0, np.float64).reshape(-1),
      method='RK45', rtol=rtol, atol=atol, first_step=first_step)
  return ODESolution(
      y=jnp.asarray(sol.y[:, -1], jnp.float32).reshape(shape),
      num_steps=jnp.int32(sol.t.size - 1), num_rejected=jnp.int32(0),
      nfe=jnp.int32(nfev[0]), success=jnp.asarray(bool(sol.success)))


@pytest.fixture(scope='module')
def stiff_trained():
  """Train the tiny config for several hundred steps (train BPD drops from
  ~11 to <9) so the learned schedule moves well away from its smooth init.
  (More steps sharpen it further but this single-CPU CI budget caps at
  ~2 min of training.)"""
  from mulan_tpu.train.loop import Experiment
  config = tiny_synthetic.get_config()
  config.training.substeps = 50
  config.training.num_steps_train = 600
  config.training.batch_size_train = 8
  config.training.num_steps_lr_warmup = 100
  exp = Experiment(config)
  state = exp._put_state(exp.state)
  first_bpd = None
  metrics = None
  for _ in range(config.training.num_steps_train
                 // config.training.substeps):
    batch = exp._put_superbatch(next(exp.train_iter))
    state, metrics = exp._p_superstep(state, batch)
    if first_bpd is None:
      first_bpd = float(jnp.mean(metrics['bpd']))
  last_bpd = float(jnp.mean(metrics['bpd']))
  assert last_bpd < first_bpd, (first_bpd, last_bpd)
  exp.state = jax.device_get(state)
  return exp, config


def _bpd_from_likelihood(likelihood, params, rng, images, cfg,
                         dequantization='tn'):
  log_p, _, aux, stats = likelihood(params, rng, images)
  assert bool(stats['success'])
  offset = bpd_offset(dequantization, 1, cfg.gamma_min)
  return (float(jnp.mean(-log_p + aux)) / (cfg.n_pixels * np.log(2.0))
          + offset), int(stats['nfe'])


def test_trained_model_tolerance_sweep(stiff_trained):
  exp, config = stiff_trained
  cfg = exp.model_config
  params = exp.state.ema_params
  batch = next(create_one_time_eval_dataset(config, batch_size=4))
  images = jnp.asarray(batch['images'])
  rng = jax.random.PRNGKey(17)

  # Reference architecture: host scipy RK45, float64, tight tolerance.
  ref_like = make_ode_likelihood_fn(exp.model, cfg, rtol=1e-6, atol=1e-6,
                                    odeint=scipy_odeint)
  ref_bpd, ref_nfe = _bpd_from_likelihood(ref_like, params, rng, images, cfg)
  assert np.isfinite(ref_bpd) and ref_nfe > 0

  sweep = {}
  for tol in (1e-3, 1e-5):
    like = jax.jit(make_ode_likelihood_fn(exp.model, cfg, rtol=tol,
                                          atol=tol))
    sweep[tol], nfe = _bpd_from_likelihood(like, params, rng, images, cfg)
    assert nfe > 0

  # fp32 on-device DoPri5 at the paper tolerance stays inside the 0.01-BPD
  # parity budget of the float64 host solve; the sweep converges toward it.
  assert abs(sweep[1e-5] - ref_bpd) <= 0.01, (sweep, ref_bpd)
  assert abs(sweep[1e-3] - ref_bpd) <= 0.25, (sweep, ref_bpd)
  assert abs(sweep[1e-5] - ref_bpd) <= abs(sweep[1e-3] - ref_bpd) + 1e-3, (
      sweep, ref_bpd)
