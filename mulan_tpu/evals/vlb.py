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

import functools
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

  # Collect DEVICE scalars and materialize once at the end: converting per
  # batch would sync the host into every dispatch, serializing the loop on
  # dispatch latency instead of device throughput.
  bpds = []
  for i, batch in enumerate(loader):
    if max_batches is not None and i >= max_batches:
      break
    rng, step_rng = jax.random.split(rng)
    bpds.append(batch_bpd(params, experiment._put_batch(batch), step_rng))
    if (i + 1) % 100 == 0:
      logging.info('sparse eval: %d batches dispatched', i + 1)
  logging.info('sparse eval: %d batches', len(bpds))
  return float(np.mean([np.asarray(b) for b in bpds]))


def eval_bpd_dense(experiment, config, n_timesteps: int = 128,
                   params=None, batch_size: Optional[int] = None,
                   images_per_chunk: Optional[int] = None,
                   max_batches: Optional[int] = None) -> float:
  """Dense per-timestep VLB sweep, multi-image, mesh-sharded, multi-host.

  For each image, evaluates the ELBO on the stratified grid
  t_j = (u_i + j/n_timesteps) mod 1 with an independent random offset u_i per
  image (the t-distribution the reference's antithetic trick induces over its
  n_timesteps tiled copies of a single image, notebook_utils.py:183). Each
  grid copy re-samples its own latent embedding and diffusion noise, matching
  reference semantics.

  Multi-host: every process feeds its local loader shard through
  `mesh_lib.shard_batch` (process-local-data assembly — the same path the
  train loop uses); per-image results come back replicated so every host
  computes the identical global mean. `images_per_chunk` counts PER-HOST
  images per compiled call. Chunks are padded per host to the local device
  count and de-padded via a mask that rides through the jit, so host-side
  code never depends on the global device order.
  """
  model = experiment.model
  cfg = experiment.model_config
  if params is None:
    params = experiment.state.ema_params
  if batch_size is None:
    batch_size = config.training.batch_size_eval
  n_dev = experiment.mesh.devices.size
  pc = jax.process_count()
  if images_per_chunk is None:
    # (image, t) pairs one compiled call processes, per host: 512 rows/chip.
    # The ELBO here is forward-only (no grad residuals), so the live set is
    # the UNet skip stack — (n_layer+1) bf16 activations, ~4.4 GB at 512
    # rows for the flagship — and larger dispatches amortize the per-call
    # host->device latency that dominates at the train-step's 128 rows.
    images_per_chunk = max(1, (n_dev * 512) // n_timesteps // pc)

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

  replicated = mesh_lib.replicated_sharding(experiment.mesh)

  @functools.partial(jax.jit, out_shardings=(replicated, replicated))
  def chunk_bpd(params, images, conditioning, labels, mask, rng):
    """images: (B, H, W, C) -> (per-image mean bpd over the t-grid, mask).

    The mask passes THROUGH the jit so the host reads per-image values and
    their validity in the same (global, replicated) order.
    """
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
    return jnp.mean(bpd, axis=1), mask

  # Device results are collected and materialized ONCE after the loop:
  # syncing per chunk would serialize the host on each dispatch's round-trip
  # latency; deferring lets JAX queue chunks back-to-back on the device.
  results = []
  n_dispatched = 0
  for bi, batch in enumerate(loader):
    if max_batches is not None and bi >= max_batches:
      break
    for lo in range(0, len(batch['images']), images_per_chunk):
      sl = slice(lo, lo + images_per_chunk)
      # Real labels/conditioning ride along like the reference's
      # loss_fn(batch) (notebook_utils.py:185) — they matter for
      # reparam_type != 'true' (one-hot label embeddings) and conditioned
      # evals.
      chunk = {'images': batch['images'][sl],
               'labels': np.asarray(batch['labels'][sl], np.int32),
               'conditioning': np.asarray(batch['conditioning'][sl],
                                          np.uint8)}
      n_dispatched += len(chunk['images'])
      rng, step_rng = jax.random.split(rng)
      chunk = mesh_lib.shard_host_padded(experiment.mesh, chunk)
      results.append(chunk_bpd(
          params, chunk['images'], chunk['conditioning'], chunk['labels'],
          chunk['mask'], step_rng))
    if (bi + 1) % 8 == 0:
      logging.info('dense eval: %d images dispatched', n_dispatched)
  if not results:
    raise RuntimeError('dense eval saw zero batches: the eval split is '
                       'empty, batch_size exceeds it, or max_batches=0.')
  bpds = np.concatenate([np.asarray(p)[np.asarray(m, bool)]
                         for p, m in results])
  logging.info('dense eval: %d images total, bpd %.4f', len(bpds),
               np.mean(bpds))
  return float(np.mean(bpds))
