"""Likelihood-evaluation suite tests: sparse/dense VLB, exact-NLL ODE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from mulan_tpu import evals
from mulan_tpu.configs import tiny_synthetic
from mulan_tpu.evals.nll_ode import bpd_offset, make_ode_likelihood_fn
from mulan_tpu.models import build_model
from mulan_tpu.ops.ode import odeint_dopri5


@pytest.fixture(scope='module')
def trained_tiny(tmp_path_factory):
  """A tiny experiment trained for 4 steps with a saved checkpoint."""
  from mulan_tpu.train.loop import Experiment
  config = tiny_synthetic.get_config()
  workdir = str(tmp_path_factory.mktemp('run'))
  exp = Experiment(config)
  exp.train_and_evaluate(workdir)
  return exp, config, workdir


@pytest.fixture(scope='module')
def trained_tiny_vdm(tmp_path_factory):
  """A tiny scalar-gamma VDM (vdm_type='vdm') trained for 4 steps."""
  from mulan_tpu.train.loop import Experiment
  config = tiny_synthetic.get_config()
  config.vdm_type = 'vdm'
  config.model.gamma_type = 'learnable_nnet'
  config.model.z_conditioning = False
  workdir = str(tmp_path_factory.mktemp('vdm_run'))
  exp = Experiment(config)
  exp.train_and_evaluate(workdir)
  return exp, config


@pytest.fixture(scope='module')
def converged_tiny(tmp_path_factory):
  """The tiny synthetic model trained to convergence (512 steps) — the
  fixture behind the estimator-ordering integration test."""
  from mulan_tpu.train.loop import Experiment
  config = tiny_synthetic.get_config()
  config.training.substeps = 64
  config.training.num_steps_train = 512
  config.training.steps_per_logging = 256
  config.training.steps_per_eval = 512
  config.training.steps_per_save = 512
  workdir = str(tmp_path_factory.mktemp('converged'))
  exp = Experiment(config)
  exp.train_and_evaluate(workdir)
  return exp, config


def test_sparse_vlb(trained_tiny):
  exp, config, _ = trained_tiny
  bpd = evals.eval_bpd_sparse(exp, config, max_batches=2)
  assert np.isfinite(bpd) and 0 < bpd < 50


def test_dense_vlb_multi_image(trained_tiny):
  exp, config, _ = trained_tiny
  bpd = evals.eval_bpd_dense(exp, config, n_timesteps=8, max_batches=2)
  assert np.isfinite(bpd) and 0 < bpd < 50


def test_dense_and_sparse_estimate_same_elbo(trained_tiny):
  """Dense (stratified grid) and sparse (MC) estimate the same quantity;
  with enough samples they agree to sub-bpd tolerance."""
  exp, config, _ = trained_tiny
  sparse = np.mean([
      evals.eval_bpd_sparse(exp, config, max_batches=8)
  ])
  dense = evals.eval_bpd_dense(exp, config, n_timesteps=16, max_batches=4)
  assert abs(sparse - dense) < 1.0, (sparse, dense)


def test_ode_nll_runs_and_is_finite(trained_tiny):
  exp, config, _ = trained_tiny
  bpd = evals.eval_bpd_ode(exp, config, num_is=2, max_batches=1,
                           rtol=1e-3, atol=1e-3)
  assert np.isfinite(bpd)


def test_ode_is_batched_modes_agree(trained_tiny):
  """Batched IS (tiled into one solve) and the reference-style serial loop
  estimate the same quantity; on the same model/data they agree to
  estimator-noise tolerance."""
  exp, config, _ = trained_tiny
  serial = evals.eval_bpd_ode(exp, config, num_is=3, is_batch=1,
                              max_batches=1, rtol=1e-3, atol=1e-3)
  batched = evals.eval_bpd_ode(exp, config, num_is=3, is_batch=2,
                               max_batches=1, rtol=1e-3, atol=1e-3)
  assert np.isfinite(serial) and np.isfinite(batched)
  assert abs(serial - batched) < 1.0, (serial, batched)


def test_ode_rk4_end_to_end(trained_tiny):
  exp, config, _ = trained_tiny
  bpd = evals.eval_bpd_ode(exp, config, num_is=2, max_batches=1,
                           solver='rk4', rk4_steps=16)
  assert np.isfinite(bpd)


def test_ode_rk4_likelihood_converges_to_dopri5(trained_tiny, rng):
  """Fixed-grid RK4 at a generous step count reproduces the adaptive
  DoPri5 likelihood on identical randomness (only the solver differs) —
  the recorded BPD-drift bound for throughput mode."""
  import functools
  from mulan_tpu.ops.ode import odeint_rk4
  exp, _, _ = trained_tiny
  model, cfg = exp.model, exp.model_config
  params = exp.state.ema_params
  images = np.full((2, *cfg.image_shape), 100, np.uint8)

  ref_fn = make_ode_likelihood_fn(model, cfg, rtol=1e-5, atol=1e-5)
  ref_logp, _, _, ref_stats = ref_fn(params, rng, images)
  assert bool(ref_stats['success'])
  rk4_fn = make_ode_likelihood_fn(
      model, cfg, odeint=functools.partial(odeint_rk4, num_steps=128))
  rk4_logp, _, _, _ = rk4_fn(params, rng, images)
  d = cfg.n_pixels
  # per-pixel-bpd-scale agreement: |delta log_p| / (D ln 2) < 0.01 bpd
  drift = np.max(np.abs(np.asarray(rk4_logp) - np.asarray(ref_logp)))
  assert drift / (d * np.log(2.0)) < 0.01, drift


def test_estimator_ordering_nll_le_dense_le_sparse(converged_tiny):
  """The strongest sandbox stand-in for the reference's published-BPD
  reproduction (README.md:42-60 — no TFDS data or released checkpoints
  here): on a TRAINED model, exact NLL <= dense VLB ~= sparse VLB within
  MC error. A wrong sign, offset, or weighting in ANY estimator breaks the
  ordering (the discrete-likelihood offsets alone are ~O(1) bpd)."""
  exp, config = converged_tiny
  sparse = evals.eval_bpd_sparse(exp, config)
  dense = evals.eval_bpd_dense(exp, config, n_timesteps=64)
  nll = evals.eval_bpd_ode(exp, config, num_is=4, max_batches=4,
                           rtol=1e-4, atol=1e-4)
  assert np.isfinite(sparse) and np.isfinite(dense) and np.isfinite(nll)
  # dense (stratified t-grid) and sparse (MC) estimate the SAME VLB.
  assert abs(dense - sparse) < 0.3, (dense, sparse)
  # the exact NLL is bounded by the VLB (margins = measured MC noise).
  assert nll <= dense + 0.1, (nll, dense)
  assert nll <= sparse + 0.1, (nll, sparse)


def test_ode_nll_runs_for_vdm_type(trained_tiny_vdm):
  """Scalar-VDM ODE eval end-to-end: the zero encoder logits must NOT turn
  into conditioning=1.0 (hard top-k ties on all-equal logits); eval batches
  carry conditioning zeros. Consistency: NLL <= sparse VLB."""
  exp, config = trained_tiny_vdm
  sparse = evals.eval_bpd_sparse(exp, config, max_batches=4)
  ode = evals.eval_bpd_ode(exp, config, num_is=2, max_batches=1,
                           rtol=1e-3, atol=1e-3)
  assert np.isfinite(ode)
  assert ode <= sparse + 0.5, (ode, sparse)


def test_vdm_ode_path_skips_topk_conditioning(trained_tiny_vdm, monkeypatch,
                                              rng):
  """Pin the fix: the scalar VDM must not derive its ODE conditioning from
  the hard top-k of its (all-zero) encoder-stub logits."""
  from mulan_tpu.evals import nll_ode

  exp, _ = trained_tiny_vdm

  def boom(*args, **kwargs):
    raise AssertionError('scalar VDM must not route conditioning through '
                         'logits_to_embeddings (all-ones on zero logits)')

  monkeypatch.setattr(nll_ode.latents, 'logits_to_embeddings', boom)
  fn = nll_ode.make_ode_likelihood_fn(exp.model, exp.model_config,
                                      rtol=1e-3, atol=1e-3)
  images = np.full((2, *exp.model_config.image_shape), 100, np.uint8)
  log_p, _, aux, stats = fn(exp.state.ema_params, rng, images)
  assert np.all(np.isfinite(np.asarray(log_p)))
  np.testing.assert_array_equal(np.asarray(aux), 0.0)  # no latent KL
  assert bool(stats['success'])


def test_rk4_redraw_noise_is_active_and_consistent(trained_tiny):
  """Under the fixed grid the reference-default per-RHS-time Hutchinson
  redraw applies (deterministic_noise=False): the redrawn estimate must
  differ from the fixed-noise one on identical rng (path active) while
  estimating the same BPD within MC tolerance."""
  exp, config, _ = trained_tiny
  fixed = evals.eval_bpd_ode(exp, config, num_is=2, max_batches=1,
                             solver='rk4', rk4_steps=32,
                             deterministic_noise=True)
  redraw = evals.eval_bpd_ode(exp, config, num_is=2, max_batches=1,
                              solver='rk4', rk4_steps=32)
  assert np.isfinite(fixed) and np.isfinite(redraw)
  assert redraw != fixed
  assert abs(redraw - fixed) < 0.5, (redraw, fixed)


def test_dopri5_redraw_noise_opt_in(trained_tiny):
  """`redraw_noise=True` under the ADAPTIVE solver reproduces the
  reference's default estimator variant (fresh Hutchinson probe per RHS
  call under an adaptive controller, notebook_utils.py:233-261). A/B vs
  the fixed-noise default on identical rng: the opt-in must change the
  estimate (path active) while agreeing within MC tolerance; defaults
  stay fixed-noise (redraw_noise=None == redraw_noise=False)."""
  exp, config, _ = trained_tiny
  kw = dict(num_is=2, max_batches=1, rtol=1e-3, atol=1e-3)
  fixed = evals.eval_bpd_ode(exp, config, **kw)
  fixed_explicit = evals.eval_bpd_ode(exp, config, redraw_noise=False, **kw)
  redraw = evals.eval_bpd_ode(exp, config, redraw_noise=True, **kw)
  assert fixed == fixed_explicit  # default policy unchanged
  assert np.isfinite(redraw)
  assert redraw != fixed
  assert abs(redraw - fixed) < 0.5, (redraw, fixed)


def test_ode_failure_raises_incrementally(trained_tiny, monkeypatch):
  """on_solver_failure='raise' must abort within ~4 batches of dispatched
  work, not after the whole split is queued: the loader must NOT be
  consumed to the end when the very first batch's solve maxes out."""
  from mulan_tpu.evals import nll_ode

  exp, config, _ = trained_tiny
  consumed = []

  def counting_loader(config_, batch_size=None):
    def gen():
      for i in range(32):
        consumed.append(i)
        yield {'images': np.full((4, 8, 8, 3), 100, np.uint8),
               'labels': np.zeros((4,), np.int64),
               'conditioning': np.zeros((4,), np.uint8)}
    return gen()

  monkeypatch.setattr(nll_ode.data_lib, 'create_one_time_eval_dataset',
                      counting_loader)
  with pytest.raises(RuntimeError, match='max_steps'):
    evals.eval_bpd_ode(exp, config, num_is=1, rtol=1e-10, atol=1e-12,
                       first_step=1e-6, max_steps=3)
  assert len(consumed) <= 8, f'loader consumed {len(consumed)} batches'


def test_ode_failure_exclusion_accounting(trained_tiny):
  """on_solver_failure='warn' must not silently return a biased mean: when
  every batch fails the evaluator raises, naming the exclusions."""
  exp, config, _ = trained_tiny
  with pytest.raises(RuntimeError, match='failed to converge'):
    evals.eval_bpd_ode(exp, config, num_is=1, max_batches=1,
                       rtol=1e-10, atol=1e-12, first_step=1e-6,
                       max_steps=3, on_solver_failure='warn')


def test_dense_vlb_uses_loader_labels(monkeypatch):
  """With reparam_type != 'true' the embedding is one_hot(labels): the dense
  evaluator must feed the LOADER's labels (the reference passes the batch
  through loss_fn, notebook_utils.py:185), not zeros."""
  from mulan_tpu.evals import vlb as vlb_mod
  from mulan_tpu.train.loop import Experiment
  config = tiny_synthetic.get_config()
  config.model.reparam_type = 'noise'
  exp = Experiment(config)

  def loader_with(label_value):
    def fake(config_, batch_size=None):
      return iter([{
          'images': np.full((8, 8, 8, 3), 128, np.uint8),
          'labels': np.full((8,), label_value, np.int32),
          'conditioning': np.zeros((8,), np.uint8),
      }])
    return fake

  monkeypatch.setattr(vlb_mod.data_lib, 'create_one_time_eval_dataset',
                      loader_with(0))
  bpd0 = vlb_mod.eval_bpd_dense(exp, config, n_timesteps=4)
  monkeypatch.setattr(vlb_mod.data_lib, 'create_one_time_eval_dataset',
                      loader_with(3))
  bpd3 = vlb_mod.eval_bpd_dense(exp, config, n_timesteps=4)
  assert np.isfinite(bpd0) and np.isfinite(bpd3)
  # identical rng and images: any difference comes from the labels
  assert bpd0 != bpd3, (bpd0, bpd3)


def test_ode_uniform_dequantization(trained_tiny):
  exp, config, _ = trained_tiny
  bpd = evals.eval_bpd_ode(exp, config, dequantization='uniform', num_is=1,
                           max_batches=1, rtol=1e-3, atol=1e-3)
  assert np.isfinite(bpd)


def test_ode_drift_solve_matches_scipy(trained_tiny, rng):
  """The on-device fp32 DoPri5 solve of the model's [z, logp] ODE agrees
  with the reference architecture (host scipy RK45 float64 on the same
  drift) — the solver-parity 'hard part' from SURVEY.md section 7."""
  exp, _, _ = trained_tiny
  model, cfg = exp.model, exp.model_config
  params = exp.state.ema_params

  b = 2
  r1, r2, r3 = jax.random.split(rng, 3)
  data = jax.random.uniform(r1, (b, *cfg.image_shape), minval=-1, maxval=1)
  from mulan_tpu.models import latents
  embeddings = latents.logits_to_embeddings(
      jax.random.normal(r2, (b, cfg.latent_size)), cfg.latent_k)
  eps = (2 * jax.random.randint(r3, data.shape, 0, 2) - 1).astype(
      jnp.float32)
  d = cfg.n_pixels

  def ode_func(t, y):
    x = jnp.asarray(y[:b * d], jnp.float32).reshape(data.shape)

    def drift(xx):
      return model.apply({'params': params}, xx, embeddings, t, True,
                         method=model.reverse_ode)

    fx, jvp_out = jax.jvp(drift, (x,), (eps,))
    div = jnp.sum(jvp_out * eps, axis=(1, 2, 3))
    return jnp.concatenate([fx.reshape(-1), div])

  y0 = jnp.concatenate([data.reshape(-1), jnp.zeros((b,))])

  # host-side scipy in float64 (reference notebook_utils.py:350-361)
  f_jit = jax.jit(ode_func)
  ref = integrate.solve_ivp(
      lambda t, y: np.asarray(f_jit(t, jnp.asarray(y, jnp.float32)),
                              np.float64),
      (0, 1), np.asarray(y0, np.float64), rtol=1e-5, atol=1e-5,
      method='RK45')
  ref_y = ref.y[:, -1]

  sol = odeint_dopri5(ode_func, y0, 0.0, 1.0, rtol=1e-5, atol=1e-5)
  assert bool(sol.success)
  got = np.asarray(sol.y)

  # final latents agree elementwise; delta_logp agrees to ODE tolerance
  np.testing.assert_allclose(got[:b * d], ref_y[:b * d], rtol=1e-2,
                             atol=2e-3)
  np.testing.assert_allclose(got[b * d:], ref_y[b * d:], rtol=1e-2,
                             atol=5e-2)


def test_ode_nll_velocity_from_epsilon(tiny_config, rng):
  """The ImageNet32 eval path: an epsilon-trained net reinterpreted as
  velocity (README.md:49,58) through the on-device ODE."""
  import dataclasses
  from mulan_tpu.models import build_model
  from mulan_tpu.evals.nll_ode import make_ode_likelihood_fn

  cfg = dataclasses.replace(tiny_config, velocity_from_epsilon=True)
  model = build_model('mulan_velocity', cfg)
  images = jax.random.randint(rng, (2, 8, 8, 3), 0, 256).astype('uint8')
  r1, r2 = jax.random.split(rng)
  params = model.init({'params': r1, 'sample': r2}, images,
                      jnp.zeros((2,), 'int32'), jnp.zeros((2,)),
                      step=-1.0)['params']
  likelihood = make_ode_likelihood_fn(model, cfg, rtol=1e-3, atol=1e-3)
  log_p, log_q, aux, stats = likelihood(params, r2, images)
  assert log_p.shape == (2,)
  assert np.all(np.isfinite(np.asarray(log_p)))
  assert bool(stats['success']) and int(stats['nfe']) > 0


def test_bpd_offsets_match_reference_formulas():
  # uniform: log2(128)
  np.testing.assert_allclose(bpd_offset('uniform', 1), np.log2(128))
  # tn with num_is=1 (reference notebook_utils.py:450-455)
  gt = -13.3
  log_sigma = 0.5 * (gt - np.log1p(np.exp(gt)))
  extra = 0.5 * (1 + np.log(2 * np.pi)) - 0.01522
  np.testing.assert_allclose(bpd_offset('tn', 1),
                             -(extra + log_sigma) / np.log(2), rtol=1e-6)
  # tn with num_is>1 drops the single-sample Gaussian-entropy correction
  np.testing.assert_allclose(bpd_offset('tn', 20),
                             -log_sigma / np.log(2), rtol=1e-6)


def test_ode_sampler(trained_tiny, rng):
  exp, _, _ = trained_tiny
  sample_fn = evals.make_ode_sample_fn(exp.model, exp.model_config,
                                       rtol=1e-3, atol=1e-3)
  z0, nfe = sample_fn(exp.state.ema_params, rng, 4)
  assert z0.shape == (4, *exp.model_config.image_shape)
  assert jnp.all(jnp.isfinite(z0))
  assert int(nfe) > 0


def test_sample_cli_mode(trained_tiny, tmp_path):
  """--mode sample glue: checkpoint -> PNG grid, both samplers."""
  import types
  from mulan_tpu.main import _sample
  _, config, workdir = trained_tiny
  for sampler in ('ancestral', 'ode'):
    flags = types.SimpleNamespace(
        config=config, checkpoint=workdir + '/checkpoints',
        workdir=str(tmp_path), sampler=sampler, sample_batch=4, sample_T=3)
    _sample(flags)
    out = list(tmp_path.glob(f'samples_ckpt4_{sampler}.png'))
    assert len(out) == 1, out


def test_eval_experiment_harness(trained_tiny):
  from mulan_tpu.data import create_one_time_eval_dataset
  from mulan_tpu.evals.harness import EvalExperiment
  _, config, workdir = trained_tiny
  exp = EvalExperiment(config, workdir + '/checkpoints')
  assert exp.checkpoint_step == 4
  metrics = exp.test(create_one_time_eval_dataset(config))
  assert np.isfinite(metrics['eval_bpd'])
  samples = exp.random_samples(batch_size=4, T=5)
  assert samples.shape == (4, 8, 8, 3)
  emb = np.zeros(exp.model_config.latent_size, np.float32)
  emb[:3] = 1.0
  cond = exp.conditional_samples(emb, batch_size=4, T=5)
  assert cond.shape == (4, 8, 8, 3)
  assert cond.dtype == np.uint8


def test_auto_is_group_snaps_to_divisor():
  """One static n_rep per eval: nearest divisor of num_is to the rows/chip
  cap, rounded up at most 1.5x (memory bound), serial for prime num_is."""
  from mulan_tpu.evals.nll_ode import auto_is_group
  assert auto_is_group(20, 8) == 10    # paper settings: 2 solves, 1 compile
  assert auto_is_group(20, 3) == 4
  assert auto_is_group(20, 20) == 20
  assert auto_is_group(20, 1) == 1
  assert auto_is_group(1, 8) == 1
  assert auto_is_group(19, 8) == 1     # prime: serial beats a 2nd compile
  for num_is in (1, 2, 5, 12, 20, 100):
    for cap in (1, 3, 8, 64):
      g = auto_is_group(num_is, cap)
      assert num_is % g == 0 and 1 <= g <= max(1, cap + cap // 2)


def test_analyze_cli_mode(trained_tiny, tmp_path):
  """--mode analyze glue: checkpoint -> schedule/cluster analysis PNGs."""
  import types
  from mulan_tpu.main import _analyze
  _, config, workdir = trained_tiny
  flags = types.SimpleNamespace(
      config=config, checkpoint=workdir + '/checkpoints',
      workdir=str(tmp_path), analyze_batches=1, analyze_min_cosine=0.9)
  _analyze(flags)
  for name in ('cluster_gallery', 'schedule_curves', 'schedule_heatmap',
               'schedule_histograms', 'embedding_pca'):
    out = list(tmp_path.glob(f'{name}_ckpt4.png'))
    assert len(out) == 1, (name, list(tmp_path.iterdir()))


def test_dense_eval_chunk_smaller_than_device_count(trained_tiny):
  """--images_per_chunk below the local device count pads MORE rows than
  are valid (the wrap-pad path) and must still evaluate correctly."""
  exp, config, _ = trained_tiny
  bpd = evals.eval_bpd_dense(exp, config, n_timesteps=2, max_batches=1,
                             images_per_chunk=3)
  assert np.isfinite(bpd) and 0 < bpd < 50


def test_dense_eval_zero_batches_raises(trained_tiny):
  exp, config, _ = trained_tiny
  with pytest.raises(RuntimeError, match='zero batches'):
    evals.eval_bpd_dense(exp, config, n_timesteps=2, max_batches=0)
