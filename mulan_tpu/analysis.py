"""Notebook-style analysis and visualization helpers.

Parity: /root/reference/ldm/notebook_utils.py:534-753 — per-embedding noise
schedules, schedule plots/heatmaps/histograms/animations, embedding
clustering, t-SNE/PCA/DCT projections. Plot functions are matplotlib-gated
(import inside the function) so the core library never needs a display stack.
"""

from __future__ import annotations

import collections
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Model probes
# ---------------------------------------------------------------------------


def get_logits(experiment, num_batches: int = 30):
  """Encoder logits + images for a sweep of eval batches
  (notebook_utils.py:534-546)."""
  logits, images = [], []
  for _ in range(num_batches):
    batch = next(experiment.eval_iter)
    imgs = jnp.asarray(batch['images'])
    logits.append(experiment.model.apply(
        {'params': experiment.state.ema_params}, imgs,
        method=experiment.model.apply_encoder))
    images.append(imgs)
  return jnp.concatenate(logits), jnp.concatenate(images)


def noise_schedule_per_embedding(experiment, embeddings,
                                 time_steps: Optional[jnp.ndarray] = None,
                                 n_grid: int = 128):
  """gamma(z, t) curves over a t-grid for each embedding
  (notebook_utils.py:554-568); returns a list of (n_grid, n_pixels)."""
  if time_steps is None:
    time_steps = jnp.linspace(0, 1, n_grid)
  params = {'params': experiment.state.ema_params}
  out = []
  for i in range(embeddings.shape[0]):
    emb = jnp.repeat(embeddings[i:i + 1], len(time_steps), axis=0)
    out.append(experiment.model.apply(
        params, emb, time_steps, method=experiment.model.gamma_of))
  return out


def get_embedding(batch_size: int = 2, latent_size: int = 50, k: int = 15,
                  shift: int = 0):
  """Shifted canonical top-k pattern (notebook_utils.py:582-586)."""
  ones = jnp.ones((batch_size, k))
  zeros = jnp.zeros((batch_size, latent_size - k))
  return jnp.roll(jnp.concatenate([ones, zeros], axis=1), shift=shift,
                  axis=1)


# ---------------------------------------------------------------------------
# Clustering by embedding similarity (notebook_utils.py:669-710)
# ---------------------------------------------------------------------------


class Clustering:
  """Groups images whose hard embeddings have high dot-product overlap."""

  def __init__(self, images, logits, embeddings, noise_schedules,
               threshold: float = 0.8):
    self.images = np.asarray(images)
    self.noise_schedules = noise_schedules
    self.clusters = collections.defaultdict(list)
    emb = np.asarray(embeddings)
    self.dotp = emb @ emb.T
    self.threshold = threshold * np.max(self.dotp)

  def cluster_indices(self, cluster_count: int = 20,
                      cluster_size_max: int = 10):
    """Returns a list of index lists, one per cluster."""
    seeds = np.where(np.sum(self.dotp > self.threshold, axis=0) > 1)[0]
    clusters = []
    for i in seeds[:cluster_count]:
      members = [int(i)]
      for j in np.where(self.dotp[i] > self.threshold)[0]:
        if j == i:
          continue
        members.append(int(j))
        if len(members) == cluster_size_max:
          break
      clusters.append(members)
    return clusters

  def print_clusters(self, cluster_count: int = 20,
                     cluster_size_max: int = 10):
    import matplotlib.pyplot as plt
    schedules = []
    for members in self.cluster_indices(cluster_count, cluster_size_max):
      fig = plt.figure(figsize=(len(members), 1))
      for pos, idx in enumerate(members):
        fig.add_subplot(1, len(members), pos + 1)
        plt.imshow(self.images[idx])
        plt.xticks([])
        plt.yticks([])
      schedules.append(self.noise_schedules[members[0]])
    plt.figure()
    for ns in schedules:
      plt.plot([np.mean(ns_pixel) for ns_pixel in ns])
      plt.ylabel(r'$\gamma(t)$')
      plt.xlabel('$t$')
    plt.title('Noise schedule for an image from each cluster')


# ---------------------------------------------------------------------------
# Projections (notebook_utils.py:713-733)
# ---------------------------------------------------------------------------


def pca_transformation(data, n_components: int = 4):
  from sklearn.decomposition import PCA
  pca = PCA(n_components=n_components, svd_solver='full')
  pca.fit(data)
  return pca.fit_transform(data)


def tsne_transformation(data, perplexity: int = 25):
  from sklearn.manifold import TSNE
  return TSNE(2, perplexity=perplexity).fit_transform(np.asarray(data))


def dct2(image):
  """2-D DCT of a grayscale-converted image (notebook_utils.py:730-733)."""
  import scipy.fftpack
  image = np.asarray(image, np.float64)
  if image.ndim == 3:
    image = image @ np.array([0.2125, 0.7154, 0.0721])
  return scipy.fftpack.dct(
      scipy.fftpack.dct(image.T, norm='ortho').T, norm='ortho')


# ---------------------------------------------------------------------------
# Plots (notebook_utils.py:571-667)
# ---------------------------------------------------------------------------


def plot_noise_schedule(noise_schedules, epoch=''):
  import matplotlib.pyplot as plt
  plt.figure()
  plt.plot(np.asarray(noise_schedules[0]))
  plt.title(f'Noise schedule per pixel for an input epoch:{epoch}')
  plt.ylabel(r'$\gamma(t)$')
  plt.xlabel('$t$')


def plot_heat_map(noise_schedules, image_shape=(32, 32, 3), count: int = 3,
                  num_cols: int = 10):
  import matplotlib.pyplot as plt
  for ns in noise_schedules[:count]:
    ns = np.asarray(ns)
    fig = plt.figure(figsize=(6, 6))
    for t in range(num_cols):
      fig.add_subplot(1, num_cols, t + 1)
      nspp = ns[int(ns.shape[0] * t / num_cols)].reshape(image_shape)
      nspp = nspp[2:-2, 2:-2, :]
      nspp = (nspp - nspp.min()) / (nspp.max() - nspp.min() + 1e-12)
      gray = nspp @ np.array([0.2125, 0.7154, 0.0721])
      plt.imshow(gray, cmap='hot', interpolation='nearest')
      plt.title('t={:.1f}'.format(t / num_cols), fontsize=8)
      plt.xticks([])
      plt.yticks([])


def plot_sequence_images(image_array, dpi: float = 100.0, interval=800):
  """Animate an image sequence in a notebook (notebook_utils.py:588-607)."""
  import matplotlib.pyplot as plt
  from matplotlib import animation
  fig = plt.figure(
      figsize=(image_array[0].shape[1] / dpi,
               image_array[0].shape[0] / dpi), dpi=dpi)
  im = plt.figimage(image_array[0])

  def animate(i):
    im.set_array(image_array[i])
    return (im,)

  return animation.FuncAnimation(fig, animate, frames=len(image_array),
                                 interval=interval, repeat=True)


def animate_noise_schedule(noise_schedules, interval=800):
  """Animate schedule curves over training (notebook_utils.py:610-627)."""
  import matplotlib.pyplot as plt
  from matplotlib import animation
  fig, ax = plt.subplots()

  def animate(i):
    ax.clear()
    ax.plot(np.asarray(noise_schedules[i]))

  return animation.FuncAnimation(fig, animate, frames=len(noise_schedules),
                                 interval=interval, repeat=True)


def animate_scatter(xs, ys, cs, interval=800):
  """Animated embedding scatter (notebook_utils.py:736-753)."""
  import matplotlib.pyplot as plt
  from matplotlib import animation
  fig, ax = plt.subplots()

  def animate(i):
    ax.clear()
    ax.axis([-2, 2, -2, 2])
    ax.scatter(xs[i], ys[i], c=(cs[i] > np.mean(cs[i])))

  return animation.FuncAnimation(fig, animate, frames=len(xs),
                                 interval=interval, repeat=True)


def plot_histogram(noise_schedules, count: int = 3, num_cols: int = 5):
  import matplotlib.pyplot as plt
  for ns in noise_schedules[:count]:
    ns = np.asarray(ns)
    ns = (ns - ns.min()) / (ns.max() - ns.min() + 1e-12)
    fig = plt.figure(figsize=(num_cols, 1))
    for t in range(num_cols):
      fig.add_subplot(1, num_cols, t + 1)
      plt.hist(ns[int(ns.shape[0] * t / num_cols)], bins=100)
      plt.xticks([])
      plt.yticks([])
