"""Variational-lower-bound BPD estimators (sparse and dense).

Parity: /root/reference/ldm/notebook_utils.py:157-191.

  * sparse: one Monte-Carlo ELBO evaluation per test image (antithetic t
    across the batch) — cheap, high variance.
  * dense: a stratified grid of `n_timesteps` diffusion times per image.
    The reference implements this by tiling ONE image n_timesteps times and
    letting antithetic sampling turn the copies into a t-grid — which forces
    batch_size=1 and a single GPU (README.md:60). Here the grid is explicit
    (model.elbo takes t), so a batch of images expands to a flat
    (batch * n_timesteps) super-batch that is CHUNKED through jit (scan-style
    host loop over compiled chunks) and sharded across all chips on the mesh:
    dense eval becomes multi-chip/multi-host, which is one of the headline
    capability deltas over the reference (BASELINE.md).
"""

from __future__ import annotations

from typing import Optional

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu import data as data_lib
from mulan_tpu.parallel import mesh as mesh_lib


def _bpd_terms(outputs, n_pixels: int):
  nats = outputs.loss_recon + outputs.loss_klz + outputs.loss_diff
  return nats / (n_pixels * np.log(2.0))


def eval_bpd_sparse(experiment, config, params=None,
                    batch_size: Optional[int] = None,
                    max_batches: Optional[int] = None) -> float:
  """MC estimate over the full eval split (notebook_utils.py:157-173)."""
  model = experiment.model
  cfg = experiment.model_config
  if params is None:
    params = experiment.state.ema_params
  loader = data_lib.create_one_time_eval_dataset(config, batch_size)
  rng = jax.random.PRNGKey(0)

  @jax.jit
  def batch_bpd(params, batch, rng):
    outputs = model.apply(
        {'params': params}, images=batch['images'], labels=batch['labels'],
        conditioning=batch['conditioning'], step=0,
        rngs={'sample': rng}, deterministic=True)
    return jnp.mean(_bpd_terms(outputs, cfg.n_pixels))

  bpds = []
  for i, batch in enumerate(loader):
    if max_batches is not None and i >= max_batches:
      break
    rng, step_rng = jax.random.split(rng)
    bpds.append(float(batch_bpd(
        params, experiment._put_batch(batch), step_rng)))
    if (i + 1) % 100 == 0:
      logging.info('sparse eval step %d cum_avg_bpd %.4f', i + 1,
                   np.mean(bpds))
  logging.info('sparse eval: %d batches', len(bpds))
  return float(np.mean(bpds))


def eval_bpd_dense(experiment, config, n_timesteps: int = 128,
                   params=None, batch_size: Optional[int] = None,
                   images_per_chunk: Optional[int] = None,
                   max_batches: Optional[int] = None) -> float:
  """Dense per-timestep VLB sweep, multi-image and mesh-sharded.

  For each image, evaluates the ELBO on the stratified grid
  t_j = (u_i + j/n_timesteps) mod 1 with an independent random offset u_i per
  image (the t-distribution the reference's antithetic trick induces over its
  n_timesteps tiled copies of a single image, notebook_utils.py:183). Each
  grid copy re-samples its own latent embedding and diffusion noise, matching
  reference semantics.
  """
  model = experiment.model
  cfg = experiment.model_config
  if params is None:
    params = experiment.state.ema_params
  if batch_size is None:
    batch_size = config.training.batch_size_eval
  # how many (image, t) pairs one compiled call processes
  n_dev = experiment.mesh.devices.size
  if images_per_chunk is None:
    images_per_chunk = max(1, (n_dev * 128) // n_timesteps)

  loader = data_lib.create_one_time_eval_dataset(config, batch_size)
  rng = jax.random.PRNGKey(0)

  # The latent logits are t-independent: run the encoder ONCE per image and
  # tile the logits over the grid (the latent top-k/gumbel noise is still
  # re-sampled per grid copy inside elbo). Only MuLAN latent-logit models
  # have this shortcut; the scalar VDM and gaussian latents take the plain
  # path.
  share_encoder = (getattr(model, 'parameterization', None) is not None
                   and cfg.latent_type in ('topk', 'gumbel')
                   and cfg.reparam_type == 'true')

  @jax.jit
  def chunk_bpd(params, images, conditioning, labels, rng):
    """images: (B, H, W, C) -> per-image mean bpd over the t-grid."""
    b = images.shape[0]
    rng, t_rng, elbo_rng = jax.random.split(rng, 3)
    u = jax.random.uniform(t_rng, (b, 1))
    grid = (u + jnp.arange(n_timesteps) / n_timesteps) % 1.0  # (B, T)
    t = grid.reshape(-1)                                      # (B*T,)
    tiled = jnp.repeat(images, n_timesteps, axis=0)
    cond = jnp.repeat(conditioning, n_timesteps, axis=0)
    labs = jnp.repeat(labels, n_timesteps, axis=0)
    kwargs = {}
    if share_encoder:
      logits = model.apply({'params': params}, images,
                           method=model.apply_encoder)
      kwargs['encoder_logits'] = jnp.repeat(logits, n_timesteps, axis=0)
    outputs = model.apply(
        {'params': params}, images=tiled, labels=labs, conditioning=cond,
        step=0, t=t, rngs={'sample': elbo_rng}, deterministic=True,
        method=model.elbo, **kwargs)
    bpd = _bpd_terms(outputs, cfg.n_pixels).reshape(b, n_timesteps)
    return jnp.mean(bpd, axis=1)

  sharding = mesh_lib.batch_sharding(experiment.mesh)
  bpds = []
  n_images = 0
  for bi, batch in enumerate(loader):
    if max_batches is not None and bi >= max_batches:
      break
    images = batch['images']
    for lo in range(0, len(images), images_per_chunk):
      sl = slice(lo, lo + images_per_chunk)
      chunk = images[sl]
      if len(chunk) % n_dev != 0:  # pad to the device count, then mask
        pad = -len(chunk) % n_dev
        chunk = np.concatenate([chunk, chunk[:pad]], axis=0)
        mask = np.arange(len(chunk)) < (len(chunk) - pad)
      else:
        mask = np.ones(len(chunk), bool)
      rng, step_rng = jax.random.split(rng)
      # eval batches carry zero conditioning/labels (pipeline contract)
      per_image = chunk_bpd(
          params,
          jax.device_put(chunk, sharding),
          jax.device_put(np.zeros(len(chunk), np.uint8), sharding),
          jax.device_put(np.zeros(len(chunk), np.int32), sharding),
          step_rng)
      bpds.extend(np.asarray(per_image)[mask].tolist())
      n_images += int(mask.sum())
    if n_images % 512 < images_per_chunk:
      logging.info('dense eval: %d images, cum_avg_bpd %.4f', n_images,
                   np.mean(bpds))
  logging.info('dense eval: %d images total', n_images)
  return float(np.mean(bpds))
