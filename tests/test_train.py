"""End-to-end training-loop tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu.configs import tiny_synthetic
from mulan_tpu.parallel import mesh as mesh_lib
from mulan_tpu.train.loop import Experiment
from mulan_tpu.train.optimizer import make_lr_schedule, make_optimizer
from mulan_tpu.train.state import TrainState, merge_restored


@pytest.fixture(scope='module')
def experiment():
  return Experiment(tiny_synthetic.get_config())


def test_mesh_spans_all_devices(experiment):
  assert experiment.mesh.devices.size == jax.device_count() == 8


def test_train_superstep_advances_and_is_finite(experiment, tmp_path):
  experiment.train_and_evaluate(str(tmp_path / 'run'))
  assert int(experiment.state.step) == 4


def test_checkpoint_resume_roundtrip(tmp_path):
  config = tiny_synthetic.get_config()
  workdir = str(tmp_path / 'run')
  exp = Experiment(config)
  exp.train_and_evaluate(workdir)
  params_after = jax.device_get(exp.state.params)

  # A fresh experiment resumes from the checkpoint and keeps params.
  exp2 = Experiment(config)
  from mulan_tpu.train import checkpoint as ckpt_lib
  mngr = ckpt_lib.CheckpointManager(workdir + '/checkpoints')
  assert mngr.latest_step() == 4
  restored = mngr.restore(exp2.state)
  assert int(restored.step) == 4
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
      params_after, jax.device_get(restored.params))


def test_eval_checkpoint_path(tmp_path):
  config = tiny_synthetic.get_config()
  workdir = str(tmp_path / 'run')
  exp = Experiment(config)
  exp.train_and_evaluate(workdir)
  scalars = exp.evaluate(str(tmp_path / 'eval'), workdir + '/checkpoints')
  assert 'eval_bpd' in scalars
  assert np.isfinite(scalars['eval_bpd'])


def test_partial_restore_merges_only_present_keys():
  state = {'a': {'x': 1, 'y': 2}, 'b': 3}
  restored = {'a': {'x': 10}, 'c': 99}
  merged = merge_restored(state, restored)
  assert merged == {'a': {'x': 10, 'y': 2}, 'b': 3}


def test_optimizer_two_groups_and_decay_mask(rng):
  params = {
      'score_model': {'w': {'kernel': jnp.ones((4, 4)),
                            'bias': jnp.zeros(4)}},
      'gamma': {'dense_1': {'kernel': jnp.ones((4, 4)),
                            'bias': jnp.zeros(4)}},
      'encoder_model': {'d': {'kernel': jnp.ones((4, 4))}},
  }
  schedule = make_lr_schedule(1e-3, 0, 100, lr_decay=False)
  tx = make_optimizer(
      {'name': 'adamw',
       'args': {'b1': 0.9, 'b2': 0.99, 'eps': 1e-8, 'weight_decay': 0.01}},
      schedule, gamma_lr_scale=0.5)
  opt_state = tx.init(params)
  grads = jax.tree.map(jnp.ones_like, params)
  updates, _ = tx.update(grads, opt_state, params)
  # every group received updates
  assert all(
      bool(jnp.all(jnp.isfinite(leaf)) and jnp.any(leaf != 0))
      for leaf in jax.tree.leaves(updates))
  # the non-score group's update reflects the scaled learning rate: for the
  # first adam step with unit grads and zero weight-decay params (bias), the
  # update magnitude is exactly lr (score) vs lr * scale (gamma group)
  score_bias = updates['score_model']['w']['bias']
  gamma_bias = updates['gamma']['dense_1']['bias']
  np.testing.assert_allclose(np.abs(score_bias), 1e-3, rtol=1e-4)
  np.testing.assert_allclose(np.abs(gamma_bias), 0.5e-3, rtol=1e-4)


def test_lr_schedule_warmup_and_decay():
  schedule = make_lr_schedule(2e-4, 100, 1000, lr_decay=False)
  assert float(schedule(0)) == 0.0
  np.testing.assert_allclose(float(schedule(100)), 2e-4, rtol=1e-6)
  np.testing.assert_allclose(float(schedule(10**6)), 2e-4, rtol=1e-6)
  decay = make_lr_schedule(2e-4, 100, 1000, lr_decay=True)
  np.testing.assert_allclose(float(decay(1000)), 0.0, atol=1e-12)


def test_dp_sharding_matches_single_device(tiny_config, rng):
  """The jit'd loss/grad on an 8-device mesh equals the single-device
  result — the DP-equivalence check from SURVEY.md section 4."""
  import dataclasses
  from mulan_tpu.models import build_model

  cfg = dataclasses.replace(tiny_config, sm_pdrop=0.0)
  model = build_model('mulan_epsilon', cfg)
  images = jnp.zeros((8, 8, 8, 3), 'uint8')
  labels = jnp.zeros((8,), 'int32')
  conditioning = jnp.zeros((8,))
  r1, r2 = jax.random.split(rng)
  params = model.init({'params': r1, 'sample': r2}, images, labels,
                      conditioning, step=-1.0)

  def loss(params, images):
    out = model.apply(params, images, labels, conditioning, step=0.0,
                      rngs={'sample': r2}, deterministic=True)
    return jnp.mean(out.loss_recon + out.loss_klz + out.loss_diff)

  grad_fn = jax.jit(jax.value_and_grad(loss))

  # single device
  dev0 = jax.devices()[0]
  v1, g1 = grad_fn(jax.device_put(params, dev0),
                   jax.device_put(images, dev0))

  # 8-device mesh: params replicated, batch sharded
  mesh = mesh_lib.create_mesh()
  params_r = jax.device_put(params, mesh_lib.replicated_sharding(mesh))
  images_s = jax.device_put(images, mesh_lib.batch_sharding(mesh))
  v8, g8 = grad_fn(params_r, images_s)

  np.testing.assert_allclose(float(v1), float(v8), rtol=2e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5), g1, g8)


def test_seed_reproducibility():
  """Two experiments from the same config produce identical first-step
  metrics (deterministic init + data + rng folding)."""
  config = tiny_synthetic.get_config()

  def first_metrics():
    exp = Experiment(config)
    state = exp._put_state(exp.state)
    batch = exp._put_superbatch(next(exp.train_iter))
    _, metrics = exp._p_superstep(state, batch)
    return float(jnp.mean(metrics['bpd']))

  assert first_metrics() == first_metrics()


def test_vdm_baseline_end_to_end(tmp_path):
  """BASELINE config #1: scalar-schedule VDM, train + VLB eval on CPU."""
  config = tiny_synthetic.get_config()
  config.vdm_type = 'vdm'
  config.model.gamma_type = 'learnable_nnet'
  config.model.z_conditioning = False
  exp = Experiment(config)
  exp.train_and_evaluate(str(tmp_path / 'run'))
  assert int(exp.state.step) == 4


def test_mulan_epsilon_end_to_end(tmp_path):
  """MuLAN-epsilon training path (BASELINE config #2 shape)."""
  config = tiny_synthetic.get_config()
  config.vdm_type = 'mulan_epsilon'
  exp = Experiment(config)
  exp.train_and_evaluate(str(tmp_path / 'run'))
  assert int(exp.state.step) == 4


def test_nan_guard_superstep_catches_nan():
  """training.nan_guard verifies per-substep scalars after each super-step
  and fails naming the first bad (substep, scalar) — debug config,
  SURVEY section 5. (checkify was evaluated instead but its per-op
  instrumentation explodes XLA compile time; see docs/NEXT.md.)"""
  import jax
  import jax.numpy as jnp
  import pytest
  from mulan_tpu.configs import tiny_synthetic
  from mulan_tpu.train.loop import Experiment

  config = tiny_synthetic.get_config()
  config.training.nan_guard = True
  exp = Experiment(config)
  # host copy first: the jit'd superstep DONATES its input state buffers
  host_state = jax.device_get(exp.state)
  state = exp._put_state(host_state)
  batch = exp._put_superbatch(next(exp.train_iter))
  # clean state: runs and advances
  state2, metrics = exp._p_superstep(state, batch)
  assert int(state2.step) == config.training.substeps
  assert jnp.isfinite(metrics['bpd']).all()

  # poison the parameters with NaN -> the guard fires with a location
  bad_params = jax.tree.map(lambda x: x * jnp.nan, host_state.params)
  bad_state = exp._put_state(host_state.replace(params=bad_params))
  with pytest.raises(FloatingPointError, match='substep 0'):
    exp._p_superstep(bad_state, batch)
