"""Experiment orchestration: jit(scan) training over a device mesh.

Replaces the reference's pmap design (/root/reference/ldm/experiment.py):

  reference                                this framework
  ---------------------------------------  ----------------------------------
  pmap(scan(train_step), 'batch')          jit(scan(train_step)) over a Mesh
  flax_utils.replicate / unreplicate       NamedSharding: params replicated,
                                           batch sharded on 'data'
  lax.pmean(grads, 'batch')                mean-over-global-batch loss; XLA
                                           inserts the gradient all-reduce
  per-device rng fold_in(axis_index)       one global rng per step
                                           (partitionable threefry)
  clu MultihostCheckpoint                  orbax CheckpointManager

The super-step structure is preserved: one host dispatch runs
`training.substeps` optimizer steps under `lax.scan` (reference
experiment.py:90-91), with the input pipeline delivering
(substeps, per_host_batch, ...) uint8 super-batches.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Tuple

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu import data as data_lib
from mulan_tpu.models import build_model, model_config_from_dict
from mulan_tpu.parallel import mesh as mesh_lib
from mulan_tpu.train import checkpoint as ckpt_lib
from mulan_tpu.train.optimizer import make_lr_schedule, make_optimizer
from mulan_tpu.train.state import TrainState
from mulan_tpu.utils import create_writer, image_grid


class Experiment:
  """Train and evaluate a VDM/MuLAN model on a TPU mesh."""

  def __init__(self, config, mesh=None):
    self.config = config
    if mesh is None:
      mesh = mesh_lib.create_mesh(fsdp=config.training.get('fsdp', 1),
                                  tp=config.training.get('tp', 1))
    self.mesh = mesh
    self.model_config = model_config_from_dict(dict(config.model))
    # With a 'tensor' mesh axis, UNet block activations pin their channel
    # axis to it (parallel/mesh.py constrain_activation_channels); the mesh
    # rides on the model instance so several Experiments on different meshes
    # coexist in one process without clobbering each other's traces.
    self.model = build_model(config.vdm_type, self.model_config,
                             tensor_mesh=mesh_lib.tensor_mesh_or_none(mesh))

    seed = config.training.seed
    self.rng = jax.random.PRNGKey(seed)
    self.rng, data_rng, model_rng = jax.random.split(self.rng, 3)

    logging.info('=== Initializing dataset ===')
    self.train_iter, self.eval_iter = data_lib.create_dataset(
        config, seed=int(jax.random.randint(data_rng, (), 0, 2**31 - 1)))

    logging.info('=== Initializing model ===')
    params = self._init_params(model_rng)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logging.info('parameter count: %.3fM', n_params / 1e6)
    try:  # full per-leaf table (reference experiment.py:60)
      from clu import parameter_overview
      parameter_overview.log_parameter_overview(params)
    except Exception:  # pragma: no cover - clu optional
      pass

    self.lr_schedule = make_lr_schedule(
        config.optimizer.learning_rate,
        config.training.num_steps_lr_warmup,
        config.training.num_steps_train,
        config.optimizer.lr_decay)
    tx = make_optimizer(
        dict(config.optimizer), self.lr_schedule,
        gamma_lr_scale=config.get('lr_gamma_network_scale', 1.0))
    self.state = TrainState.create(apply_fn=self.model.apply, params=params,
                                   tx=tx)

    ckpt_restore_dir = config.get('ckpt_restore_dir', 'None')
    if ckpt_restore_dir not in (None, 'None', ''):
      self.state = ckpt_lib.restore_partial_into(self.state,
                                                 ckpt_restore_dir)

    self.rng, self._train_rng, self._eval_rng, self._sample_rng = (
        jax.random.split(self.rng, 4))

    self._replicated = mesh_lib.replicated_sharding(self.mesh)
    self._compile_steps()
    logging.info('=== Done with Experiment.__init__ ===')

  # -- model pieces ----------------------------------------------------------

  def _init_params(self, rng):
    cfg = self.model_config
    inputs = {
        'images': jnp.zeros((2, *cfg.image_shape), 'uint8'),
        'labels': jnp.zeros((2,), 'int32'),
        'conditioning': jnp.zeros((2,)),
    }
    r1, r2 = jax.random.split(rng)
    # jit the init: eager flax init dispatches thousands of tiny ops to the
    # device (minutes over a remote-TPU link); one compiled program instead.
    init_fn = jax.jit(lambda r1, r2: self.model.init(
        {'params': r1, 'sample': r2}, **inputs, step=-1.0))
    return init_fn(r1, r2)['params']

  def loss_fn(self, params, batch, step, rng, is_train
              ) -> Tuple[jax.Array, Dict[str, Any]]:
    """ELBO -> scalar bpd + metric dict (reference experiment_vdm.py:47-78)."""
    rng, sample_rng = jax.random.split(rng)
    rngs = {'sample': sample_rng}
    if is_train:
      rng, dropout_rng = jax.random.split(rng)
      rngs['dropout'] = dropout_rng
    outputs = self.model.apply(
        {'params': params}, images=batch['images'], labels=batch['labels'],
        conditioning=batch['conditioning'], step=step, rngs=rngs,
        deterministic=not is_train)
    rescale_to_bpd = 1.0 / (self.model_config.n_pixels * np.log(2.0))
    bpd_latent = jnp.mean(outputs.loss_klz) * rescale_to_bpd
    bpd_recon = jnp.mean(outputs.loss_recon) * rescale_to_bpd
    bpd_diff = jnp.mean(outputs.loss_diff) * rescale_to_bpd
    bpd = bpd_recon + bpd_latent + bpd_diff
    scalars = {
        'bpd': bpd,
        'bpd_latent': bpd_latent,
        'bpd_recon': bpd_recon,
        'bpd_diff': bpd_diff,
        'var0': outputs.var_0,
        'var': outputs.var_1,
    }
    return bpd, scalars

  # -- compiled steps ---------------------------------------------------------

  def _compile_steps(self):
    ema_rate = self.config.optimizer.ema_rate
    train_rng = self._train_rng

    def train_step(state: TrainState, batch):
      rng = jax.random.fold_in(train_rng, state.step)
      grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
      (_, scalars), grads = grad_fn(state.params, batch, state.step, rng,
                                    True)
      new_state = state.apply_gradients(grads=grads, ema_rate=ema_rate)
      return new_state, scalars

    def superstep(state, superbatch):
      return jax.lax.scan(train_step, state, superbatch)

    # Pin the output state layout to the input layout (replicated on a 1-D
    # mesh; fsdp- and/or tensor-sharded on the 2-D/3-D meshes) so the
    # scanned state never migrates.
    out_shardings = (mesh_lib.state_shardings(self.mesh, self.state),
                     self._replicated)
    self._p_superstep = jax.jit(superstep, donate_argnums=(0,),
                                out_shardings=out_shardings)
    if self.config.training.get('nan_guard', False):
      # Debug config (SURVEY section 5): after every super-step, verify all
      # per-substep scalars are finite and fail NAMING the first bad
      # (substep, scalar) instead of silently training on garbage.
      # (jax.experimental.checkify was evaluated for in-step checks but its
      # per-op instrumentation blows XLA compile time up by >10x even on
      # the tiny test model — docs/NEXT.md. For op-level hunts use
      # --jax_debug_nans, which re-runs op-by-op.)
      inner = self._p_superstep

      def guarded_superstep(state, superbatch):
        state, metrics = inner(state, superbatch)
        for name, values in sorted(metrics.items()):
          finite = np.asarray(jnp.isfinite(values))
          if not finite.all():
            bad = int(np.argmin(finite.reshape(finite.shape[0], -1)
                                .all(axis=1)))
            raise FloatingPointError(
                f'nan_guard: non-finite {name!r} at substep {bad} of the '
                f'super-step ending at step {int(state.step)} '
                f'(value {np.asarray(values)[bad]!r})')
        return state, metrics

      self._p_superstep = guarded_superstep

    eval_rng = self._eval_rng

    def eval_step(ema_params, batch, eval_idx):
      rng = jax.random.fold_in(eval_rng, eval_idx)
      _, scalars = self.loss_fn(ema_params, batch, eval_idx, rng, False)
      return scalars

    self._p_eval_step = jax.jit(eval_step)

    def sample_fn(ema_params, rng, batch_size, T=1000):
      cfg = self.model_config
      rng, prior_rng = jax.random.split(rng)
      z_init = cfg.sigma_prior * jax.random.normal(
          prior_rng, (batch_size, *cfg.image_shape))
      conditioning = jnp.zeros((batch_size,), 'uint8')

      def body(i, z_t):
        return self.model.apply({'params': ema_params}, i, T, z_t,
                                conditioning, rng, method=self.model.sample)

      z_0 = jax.lax.fori_loop(0, T, body, z_init)
      return self.model.apply({'params': ema_params}, z_0,
                              method=self.model.generate_x)

    self._p_sample = jax.jit(sample_fn, static_argnums=(2, 3))

  # -- data placement ---------------------------------------------------------

  def _put_superbatch(self, batch):
    """(substeps, per_host_batch, ...) -> global arrays sharded on axis 1."""
    return mesh_lib.shard_batch(self.mesh, batch, batch_axis=1)

  def _put_batch(self, batch):
    return mesh_lib.shard_batch(self.mesh, batch, batch_axis=0)

  def _put_state(self, state):
    return mesh_lib.shard_state(self.mesh, state)

  # -- public API --------------------------------------------------------------

  def train_and_evaluate(self, workdir: str):
    config = self.config.training
    logging.info('=== train_and_evaluate: %s ===', workdir)

    ckpt = ckpt_lib.CheckpointManager(os.path.join(workdir, 'checkpoints'))
    # Place the state on the mesh BEFORE restoring: the restore template then
    # carries each leaf's NamedSharding, so orbax reassembles sharded
    # (fsdp/tp) multi-host state directly onto the right devices — no host
    # gather anywhere (the reference's MultihostCheckpoint restores a fully
    # replicated host copy, experiment.py:211-218).
    state = self._put_state(self.state)
    if ckpt.latest_step() is not None:
      state = ckpt.restore(state)
    initial_step = int(state.step)

    writer = create_writer(workdir, jax.process_index())
    if initial_step == 0 and jax.process_index() == 0:
      writer.write_hparams(dict(self.config))

    step = initial_step
    substeps = config.substeps
    last_t = time.time()
    last_log_step = initial_step
    # Profiling hook (reference experiment.py:230-232 clu Profile): capture
    # an XProf trace of the 2nd super-step on process 0.
    profile_at = initial_step + substeps if (
        config.get('profile', False) and jax.process_index() == 0) else None
    while step < config.num_steps_train:
      is_last = step + substeps >= config.num_steps_train
      if profile_at is not None and step == profile_at:
        jax.profiler.start_trace(os.path.join(workdir, 'profile'))
      with jax.profiler.StepTraceAnnotation('train', step_num=step):
        batch = self._put_superbatch(next(self.train_iter))
        state, train_metrics = self._p_superstep(state, batch)
      if profile_at is not None and step == profile_at:
        jax.block_until_ready(train_metrics)
        jax.profiler.stop_trace()
        profile_at = None

      new_step = int(state.step)
      assert new_step == step + substeps, (new_step, step, substeps)
      step = new_step

      if step % config.steps_per_logging == 0 or is_last:
        scalars = jax.tree.map(lambda x: float(jnp.mean(x)), train_metrics)
        scalars = {'train_' + k: v for k, v in scalars.items()}
        now = time.time()
        # logging intervals can span several super-steps; divide by the
        # actual step delta, not substeps
        scalars['steps_per_sec'] = (step - last_log_step) / (now - last_t)
        last_t = now
        last_log_step = step
        writer.write_scalars(step, scalars)

      if step % config.steps_per_eval == 0 or is_last or step == substeps:
        eval_scalars = self._run_eval(state.ema_params,
                                      config.num_steps_eval)
        writer.write_scalars(step, eval_scalars)
        samples = self._draw_samples(state.ema_params)
        if samples is not None:
          writer.write_images(step, {'samples': samples[None]})

      if step % config.steps_per_save == 0 or is_last:
        # Save the sharded jax.Arrays directly: orbax writes each host's
        # shards in place (multi-host coordinated). A jax.device_get here
        # would RAISE for fsdp/tp>1 across processes (non-addressable
        # arrays) and needlessly gather the full state onto every host even
        # when it would not.
        ckpt.save(step, state)
    ckpt.wait()
    writer.flush()
    # Keep the mesh-placed state (callers read replicated leaves like .step
    # directly; sharded leaves stay global arrays).
    self.state = state

  def _run_eval(self, ema_params, num_steps_eval: int):
    # Dispatch every eval step, THEN materialize once: a per-batch float()
    # conversion would sync the host into each dispatch's round-trip (the
    # pattern the standalone evaluators avoid, evals/vlb.py), serializing
    # the in-training eval block on tunnel/dispatch latency.
    all_scalars = []
    for idx in range(num_steps_eval):
      batch = self._put_batch(next(self.eval_iter))
      all_scalars.append(self._p_eval_step(ema_params, batch, jnp.int32(idx)))
    all_scalars = jax.device_get(all_scalars)
    means = {
        'eval_' + k: float(np.mean([s[k] for s in all_scalars]))
        for k in all_scalars[0]
    }
    return means

  def _draw_samples(self, ema_params, batch_size=None, T=1000):
    if batch_size is None:
      batch_size = min(64, self.config.training.batch_size_eval)
    samples = self._p_sample(ema_params, self._sample_rng, batch_size, T)
    if jax.process_count() > 1:
      from jax.experimental import multihost_utils
      # tiled: the jit output is a global (non-fully-addressable) array;
      # this fetches the assembled global value onto every host.
      samples = multihost_utils.process_allgather(samples, tiled=True)
    return image_grid(np.asarray(jax.device_get(samples)).astype(np.uint8))

  def evaluate(self, logdir: str, checkpoint_dir: str):
    """Standalone eval of a checkpoint's EMA params
    (reference experiment.py:296-332)."""
    mngr = ckpt_lib.CheckpointManager(checkpoint_dir)
    restored = mngr.restore_dict()
    import flax as flax_lib
    ema_params = flax_lib.serialization.from_state_dict(
        self.state.params, restored['ema_params'])
    step = int(np.asarray(restored['step']))
    ema_params = jax.device_put(ema_params, self._replicated)

    writer = create_writer(os.path.join(logdir, 'eval'),
                           jax.process_index())
    scalars = self._run_eval(ema_params, self.config.training.num_steps_eval)
    writer.write_scalars(step, scalars)
    samples = self._draw_samples(ema_params)
    if samples is not None:
      writer.write_images(step, {'samples': samples[None]})
    return scalars
