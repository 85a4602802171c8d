"""Analysis helpers (schedule probes, clustering, projections, figures)."""

import jax.numpy as jnp
import matplotlib
import numpy as np
import pytest

matplotlib.use('Agg')

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


def test_cluster_embeddings_groups_shared_support():
  emb = np.zeros((6, 10), np.float32)
  emb[0, :3] = 1; emb[1, :3] = 1          # cluster A
  emb[2, 5:8] = 1; emb[3, 5:8] = 1        # cluster B
  emb[4, 9] = 1; emb[5, 4] = 1            # singletons
  clusters = analysis.cluster_embeddings(emb, min_cosine=0.9)
  assert clusters.n_clusters == 2
  assert sorted(clusters.members(0)) == [0, 1]
  assert sorted(clusters.members(1)) == [2, 3]
  # singletons stay unassigned
  assert clusters.assignment[4] == -1 and clusters.assignment[5] == -1


def test_cluster_embeddings_cosine_counts_shared_latents():
  """With k active entries, cosine m/k counts the shared support m."""
  emb = np.zeros((2, 20), np.float32)
  emb[0, :4] = 1
  emb[1, 1:5] = 1  # 3 of 4 shared -> cosine 0.75
  c_loose = analysis.cluster_embeddings(emb, min_cosine=0.7)
  assert c_loose.n_clusters == 1
  c_tight = analysis.cluster_embeddings(emb, min_cosine=0.8)
  assert c_tight.n_clusters == 0


def test_cluster_gallery_figure():
  emb = np.zeros((4, 10), np.float32)
  emb[0, :3] = 1; emb[1, :3] = 1; emb[2, 5:8] = 1; emb[3, 5:8] = 1
  clusters = analysis.cluster_embeddings(emb)
  images = np.zeros((4, 8, 8, 3), np.uint8)
  fig = analysis.cluster_gallery(images, clusters)
  assert len(fig.axes) == 4  # 2 clusters x width 2


def test_projections():
  data = np.random.default_rng(0).normal(size=(20, 10))
  p = analysis.pca_transformation(data, n_components=3)
  assert p.shape == (20, 3)
  d = analysis.dct2(np.random.default_rng(0).normal(size=(8, 8, 3)))
  assert d.shape == (8, 8)


def test_schedule_figures():
  rng = np.random.default_rng(0)
  grid = np.cumsum(rng.random((16, 8 * 8 * 3)), axis=0)  # monotone in t
  fig = analysis.schedule_curves([grid, grid * 2], labels=['a', 'b'])
  assert fig.axes
  fig = analysis.schedule_heatmap(grid, (8, 8, 3), times=(0, 0.5, 1.0))
  assert len(fig.axes) == 3
  fig = analysis.schedule_histograms(grid, times=(0, 1.0))
  assert len(fig.axes) == 2
  fig = analysis.embedding_scatter(rng.normal(size=(10, 2)))
  assert fig.axes


def test_animate_generic():
  frames = [np.zeros((4, 4)), np.ones((4, 4))]
  anim = analysis.animate(lambda ax, i: ax.imshow(frames[i]), len(frames))
  assert anim is not None


def test_cluster_truncation_keeps_leader():
  """max_size truncation must never drop the leader from its own cluster
  (round-2 review finding)."""
  emb = np.zeros((7, 20), np.float32)
  # items 0-3 all overlap strongly with 6; leader visiting order starts at 0
  emb[6, :15] = 1
  for i in range(4):
    emb[i, :14] = 1
    emb[i, 15 + i] = 1
  clusters = analysis.cluster_embeddings(emb, min_cosine=0.9, min_size=3,
                                         max_size=3)
  for c in range(clusters.n_clusters):
    members = clusters.members(c)
    leader = int(clusters.leaders[c])
    assert leader in members
    assert clusters.assignment[leader] == c
