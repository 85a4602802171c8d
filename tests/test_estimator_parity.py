"""ESTIMATOR-level BPD parity against the live reference implementation.

test_grad_parity.py proves the trained function (ELBO + gradients) matches
elementwise; this file proves the EVALUATORS match at the BPD level: the
reference's sparse and dense estimators — `Experiment_VDM.loss_fn`
aggregation (/root/reference/ldm/experiment_vdm.py:47-66) composed exactly
as `eval_bpd_sparse_sampling` / `eval_bpd_dense_sampling`
(/root/reference/ldm/notebook_utils.py:157-191) — are re-run here on the
live reference model, against `mulan_tpu.evals.vlb` on transplanted params
with frozen randomness, and must agree to < 1e-3 BPD.

This is the strongest stand-in for the published 2.55/3.67-BPD targets
available in a sandbox with no TFDS data and no released checkpoints
(BASELINE.md): if the estimators agree on identical weights here, a real
checkpoint import (mulan_tpu.compat) reproduces the paper numbers up to
solver/tolerance effects that tests/test_ode_tolerance.py bounds.

Randomness freezing: same shape-seeded monkeypatch as test_grad_parity —
both sides draw the same shapes at the same semantic points, so the draws
are identical across implementations. The evaluators run on a ONE-device
mesh so padding never changes our draw shapes relative to the reference's.

Skipped when /root/reference is not present.
"""

import os

import numpy as np
import pytest

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason='reference checkout not available')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import test_grad_parity as gp  # noqa: E402  (transplant helpers)
from parity_helpers import frozen_randomness  # noqa: E402

from mulan_tpu.evals import vlb as vlb_mod  # noqa: E402
from mulan_tpu.parallel import mesh as mesh_lib  # noqa: E402


class _MiniExperiment:
  """The slice of Experiment the evaluators touch, on a 1-device mesh."""

  def __init__(self, model, model_config):
    self.model = model
    self.model_config = model_config
    self.mesh = mesh_lib.create_mesh(devices=jax.devices()[:1])

  def _put_batch(self, batch):
    return mesh_lib.shard_batch(self.mesh, batch)


def _fixed_batches(n_batches, batch_size, seed=2024):
  rs = np.random.RandomState(seed)
  return [{
      'images': rs.randint(0, 256, (batch_size, 32, 32, 3)).astype(np.uint8),
      'labels': np.zeros((batch_size,), np.int32),
      'conditioning': np.zeros((batch_size,), np.uint8),
  } for _ in range(n_batches)]


def _patch_loader(monkeypatch, batches):
  def fake_loader(config, batch_size=None):
    return iter([dict(b) for b in batches])
  monkeypatch.setattr(vlb_mod.data_lib, 'create_one_time_eval_dataset',
                      fake_loader)


def _ref_loss_bpd(ref_model, ref_params, images):
  """The reference estimator core: Experiment_VDM.loss_fn with
  is_train=False (experiment_vdm.py:47-66) — mean BPD over the batch."""
  outputs = ref_model.apply(
      {'params': ref_params}, images=jnp.asarray(images),
      labels=jnp.zeros((len(images),)),
      conditioning=jnp.zeros((len(images),)),
      step=0.0, deterministic=True,
      rngs={'sample': jax.random.PRNGKey(0)})
  rescale = 1.0 / (np.prod(images.shape[1:]) * np.log(2.0))
  return float((jnp.mean(outputs.loss_recon) + jnp.mean(outputs.loss_klz)
                + jnp.mean(outputs.loss_diff)) * rescale)


@pytest.mark.parametrize('parameterization', ['epsilon'])
def test_sparse_estimator_bpd_parity(monkeypatch, parameterization):
  ref_model, ref_params, ours, params = gp._build(parameterization)
  frozen_randomness(monkeypatch)
  batches = _fixed_batches(n_batches=2, batch_size=4)

  # reference: eval_bpd_sparse_sampling (notebook_utils.py:157-173)
  ref_bpd = float(np.mean(
      [_ref_loss_bpd(ref_model, ref_params, b['images']) for b in batches]))

  _patch_loader(monkeypatch, batches)
  exp = _MiniExperiment(ours, ours.config)
  our_bpd = vlb_mod.eval_bpd_sparse(exp, config=None, params=params,
                                    batch_size=4)
  assert abs(our_bpd - ref_bpd) < 1e-3, (our_bpd, ref_bpd)


@pytest.mark.parametrize('parameterization', ['epsilon'])
def test_dense_estimator_bpd_parity(monkeypatch, parameterization):
  """Dense VLB: the reference tiles ONE image n_timesteps times and lets
  antithetic sampling induce the t-grid (notebook_utils.py:176-191); ours
  builds the grid explicitly. Under frozen randomness both produce the
  identical (t, noise) set, so the BPDs must agree to float tolerance."""
  n_timesteps = 16
  ref_model, ref_params, ours, params = gp._build(parameterization)
  frozen_randomness(monkeypatch)
  batches = _fixed_batches(n_batches=2, batch_size=1)

  # reference: eval_bpd_dense_sampling — tile x n_timesteps, one loss_fn
  ref_bpds = []
  for b in batches:
    tiled = np.tile(b['images'], (n_timesteps, 1, 1, 1))
    ref_bpds.append(_ref_loss_bpd(ref_model, ref_params, tiled))
  ref_bpd = float(np.mean(ref_bpds))

  _patch_loader(monkeypatch, batches)
  exp = _MiniExperiment(ours, ours.config)
  our_bpd = vlb_mod.eval_bpd_dense(exp, config=None,
                                   n_timesteps=n_timesteps, params=params,
                                   batch_size=1, images_per_chunk=1)
  assert abs(our_bpd - ref_bpd) < 1e-3, (our_bpd, ref_bpd)
