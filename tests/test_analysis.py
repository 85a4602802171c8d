"""Analysis helpers (schedule probes, clustering, projections)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mulan_tpu import analysis
from mulan_tpu.configs import tiny_synthetic
from mulan_tpu.train.loop import Experiment


@pytest.fixture(scope='module')
def experiment():
  return Experiment(tiny_synthetic.get_config())


def test_get_logits(experiment):
  logits, images = analysis.get_logits(experiment, num_batches=2)
  assert logits.shape == (16, experiment.model_config.latent_size)
  assert images.shape[0] == 16


def test_noise_schedule_per_embedding(experiment):
  emb = analysis.get_embedding(batch_size=2,
                               latent_size=experiment.model_config
                               .latent_size, k=3)
  curves = analysis.noise_schedule_per_embedding(experiment, emb, n_grid=16)
  assert len(curves) == 2
  assert curves[0].shape == (16, experiment.model_config.n_pixels)
  # monotone in t
  assert (jnp.diff(curves[0], axis=0) >= -1e-5).all()


def test_get_embedding_shift():
  e = analysis.get_embedding(batch_size=1, latent_size=10, k=3, shift=2)
  np.testing.assert_array_equal(
      np.asarray(e[0]), [0, 0, 1, 1, 1, 0, 0, 0, 0, 0])


def test_clustering_indices():
  emb = np.zeros((6, 10), np.float32)
  emb[0, :3] = 1; emb[1, :3] = 1          # cluster A
  emb[2, 5:8] = 1; emb[3, 5:8] = 1        # cluster B
  emb[4, 9] = 1; emb[5, 4] = 1            # singletons
  images = np.zeros((6, 8, 8, 3), np.uint8)
  c = analysis.Clustering(images, None, emb, [None] * 6, threshold=0.8)
  clusters = c.cluster_indices()
  flat = {tuple(sorted(cl)) for cl in clusters}
  assert (0, 1) in flat and (2, 3) in flat


def test_projections():
  data = np.random.default_rng(0).normal(size=(20, 10))
  p = analysis.pca_transformation(data, n_components=3)
  assert p.shape == (20, 3)
  d = analysis.dct2(np.random.default_rng(0).normal(size=(8, 8, 3)))
  assert d.shape == (8, 8)
