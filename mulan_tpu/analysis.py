"""Analysis helpers: model probes, schedule visualization, clustering.

Capability parity with the notebook analysis layer of the reference
(/root/reference/ldm/notebook_utils.py:534-753) — probing encoder logits,
per-embedding noise-schedule curves, clustering images by latent overlap,
and low-dimensional projections — with an own API design:

  * every visualization RETURNS a matplotlib Figure (no implicit pyplot
    state), takes explicit geometry/time parameters (nothing hard-coded),
    and normalizes gamma maps over the whole time grid so frames are
    comparable;
  * clustering is greedy leader clustering on COSINE similarity (an
    absolute [-1, 1] scale with a meaningful threshold), with disjoint
    clusters, instead of dot-products thresholded relative to their max;
  * one generic `animate(draw_fn, n_frames)` covers every animation.

matplotlib/sklearn imports are gated inside functions so the core library
never needs a display stack.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

_LUMA = np.array([0.2126, 0.7152, 0.0722])  # Rec. 709 luma weights


# ---------------------------------------------------------------------------
# Model probes
# ---------------------------------------------------------------------------


def get_logits(experiment, num_batches: int = 30):
  """Encoder logits + images for a sweep of eval batches
  (capability: notebook_utils.py:534-546)."""
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
  (capability: notebook_utils.py:554-568); returns a list of
  (n_grid, n_pixels) arrays."""
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
  """Shifted canonical top-k pattern (capability: notebook_utils.py:582-586)."""
  ones = jnp.ones((batch_size, k))
  zeros = jnp.zeros((batch_size, latent_size - k))
  return jnp.roll(jnp.concatenate([ones, zeros], axis=1), shift=shift,
                  axis=1)


# ---------------------------------------------------------------------------
# Clustering by latent similarity
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EmbeddingClusters:
  """Disjoint clusters of examples with similar hard latents.

  `assignment[i]` is the cluster id of example i (or -1 for unclustered
  singletons); `members(c)` lists a cluster's examples, leader first.
  """

  assignment: np.ndarray       # (N,) int
  leaders: np.ndarray          # (n_clusters,) leader example index
  similarity: np.ndarray       # (N, N) cosine similarity

  @property
  def n_clusters(self) -> int:
    return len(self.leaders)

  def members(self, cluster_id: int) -> List[int]:
    idx = np.where(self.assignment == cluster_id)[0].tolist()
    leader = int(self.leaders[cluster_id])
    return [leader] + [i for i in idx if i != leader]


def cluster_embeddings(embeddings, *, min_cosine: float = 0.9,
                       min_size: int = 2,
                       max_size: Optional[int] = None) -> EmbeddingClusters:
  """Greedy leader clustering on cosine similarity.

  Examples are visited in order; each unassigned example becomes the leader
  of a new cluster containing every other unassigned example whose cosine
  similarity to it is >= `min_cosine`. Clusters smaller than `min_size`
  are dissolved (assignment -1). For hard top-k latents with k active
  entries, cosine similarity m/k counts the shared support m — e.g. with
  k=15, min_cosine=0.9 requires 14 of 15 shared latents.
  """
  emb = np.asarray(embeddings, np.float64)
  norms = np.linalg.norm(emb, axis=1, keepdims=True)
  unit = emb / np.maximum(norms, 1e-12)
  sim = unit @ unit.T

  n = len(emb)
  assignment = np.full(n, -1, np.int64)
  leaders: List[int] = []
  for i in range(n):
    if assignment[i] != -1:
      continue
    # leader FIRST so max_size truncation can never drop it from its own
    # cluster; vectorized candidate scan keeps the loop O(n) numpy per leader
    cand = np.where((sim[i] >= min_cosine) & (assignment == -1))[0]
    mates = [i] + [int(j) for j in cand if j != i]
    if max_size is not None:
      mates = mates[:max_size]
    if len(mates) < min_size:
      continue
    cid = len(leaders)
    assignment[np.asarray(mates)] = cid
    leaders.append(i)
  return EmbeddingClusters(assignment=assignment,
                           leaders=np.asarray(leaders, np.int64),
                           similarity=sim)


def cluster_gallery(images, clusters: EmbeddingClusters, *,
                    max_clusters: int = 16, row_height: float = 1.2):
  """One image row per cluster (leader first). Returns a Figure."""
  import matplotlib.pyplot as plt
  images = np.asarray(images)
  rows = [clusters.members(c)
          for c in range(min(clusters.n_clusters, max_clusters))]
  if not rows:
    return plt.figure()
  width = max(len(r) for r in rows)
  fig, axes = plt.subplots(len(rows), width,
                           figsize=(width * row_height,
                                    len(rows) * row_height),
                           squeeze=False)
  for r, members in enumerate(rows):
    for c in range(width):
      ax = axes[r][c]
      ax.set_axis_off()
      if c < len(members):
        ax.imshow(images[members[c]])
        if c == 0:
          ax.set_title(f'#{r}', fontsize=8)
  fig.tight_layout(pad=0.1)
  return fig


# ---------------------------------------------------------------------------
# Projections
# ---------------------------------------------------------------------------


def pca_transformation(data, n_components: int = 4):
  from sklearn.decomposition import PCA
  return PCA(n_components=n_components,
             svd_solver='full').fit_transform(np.asarray(data))


def tsne_transformation(data, perplexity: int = 25):
  from sklearn.manifold import TSNE
  return TSNE(2, perplexity=perplexity).fit_transform(np.asarray(data))


def dct2(image):
  """Type-II orthonormal 2-D DCT of an image (luma-converted if RGB)."""
  import scipy.fftpack
  image = np.asarray(image, np.float64)
  if image.ndim == 3:
    image = image @ _LUMA
  return scipy.fftpack.dct(
      scipy.fftpack.dct(image, axis=0, norm='ortho'), axis=1, norm='ortho')


# ---------------------------------------------------------------------------
# Schedule visualization — figure-returning, geometry-parameterized
# ---------------------------------------------------------------------------


def schedule_curves(gamma_grids: Sequence[np.ndarray],
                    labels: Optional[Sequence[str]] = None,
                    reduce: Callable = np.mean):
  """Pixel-reduced gamma(t) curve per grid ((T, n_pixels) each); one axes,
  shared scale. Returns a Figure."""
  import matplotlib.pyplot as plt
  fig, ax = plt.subplots()
  for i, grid in enumerate(gamma_grids):
    grid = np.asarray(grid)
    t = np.linspace(0, 1, grid.shape[0])
    label = labels[i] if labels is not None else None
    ax.plot(t, reduce(grid, axis=1), label=label)
  ax.set_xlabel('t')
  ax.set_ylabel(r'$\gamma(t)$')
  if labels is not None:
    ax.legend(fontsize=8)
  return fig


def schedule_heatmap(gamma_grid: np.ndarray, image_shape, *,
                     times: Sequence[float] = (0, .25, .5, .75, 1.0),
                     cmap: str = 'magma', panel_inches: float = 1.6):
  """Per-pixel gamma maps at selected times, one panel per t.

  Normalization is over the WHOLE (T, n_pixels) grid — panels share a color
  scale so spatial structure is comparable across time. Returns a Figure.
  """
  import matplotlib.pyplot as plt
  grid = np.asarray(gamma_grid)
  lo, hi = grid.min(), grid.max()
  fig, axes = plt.subplots(1, len(times),
                           figsize=(panel_inches * len(times),
                                    panel_inches), squeeze=False)
  for ax, t in zip(axes[0], times):
    row = grid[min(int(round(t * (grid.shape[0] - 1))), grid.shape[0] - 1)]
    img = row.reshape(image_shape)
    if img.ndim == 3:
      # Luma-collapse channels; _LUMA sums to 1 so [lo, hi] still bounds it.
      img = img @ _LUMA if img.shape[-1] == 3 else img.mean(axis=-1)
    ax.imshow(img, cmap=cmap, vmin=lo, vmax=hi, interpolation='nearest')
    ax.set_title(f't={t:.2f}', fontsize=8)
    ax.set_axis_off()
  fig.tight_layout(pad=0.1)
  return fig


def schedule_histograms(gamma_grid: np.ndarray, *,
                        times: Sequence[float] = (0, .5, 1.0),
                        bins: int = 64, panel_inches: float = 1.6):
  """Distribution of per-pixel gamma at selected times; shared x-range
  (the grid's global [min, max]). Returns a Figure."""
  import matplotlib.pyplot as plt
  grid = np.asarray(gamma_grid)
  lo, hi = float(grid.min()), float(grid.max())
  fig, axes = plt.subplots(1, len(times),
                           figsize=(panel_inches * len(times),
                                    panel_inches), squeeze=False)
  for ax, t in zip(axes[0], times):
    row = grid[min(int(round(t * (grid.shape[0] - 1))), grid.shape[0] - 1)]
    ax.hist(row, bins=bins, range=(lo, hi + 1e-9))
    ax.set_title(f't={t:.2f}', fontsize=8)
    ax.set_yticks([])
  fig.tight_layout(pad=0.1)
  return fig


def embedding_scatter(points: np.ndarray, colors=None):
  """2-D scatter of projected embeddings (pca/tsne output). Returns a
  Figure. Color ids < 0 (unclustered singletons, ClusterResult.assignment
  convention) are drawn in grey so they cannot masquerade as cluster 0."""
  import matplotlib.pyplot as plt
  points = np.asarray(points)
  fig, ax = plt.subplots()
  if colors is None:
    ax.scatter(points[:, 0], points[:, 1], s=12)
    return fig
  colors = np.asarray(colors)
  unclustered = colors < 0
  if unclustered.any():
    ax.scatter(points[unclustered, 0], points[unclustered, 1], c='0.75',
               s=12, label='unclustered')
    ax.legend(loc='best', fontsize=8)
  ax.scatter(points[~unclustered, 0], points[~unclustered, 1],
             c=colors[~unclustered], s=12)
  return fig


def animate(draw_fn: Callable[[object, int], None], n_frames: int, *,
            interval_ms: int = 200, figsize=None):
  """Generic notebook animation: `draw_fn(ax, frame)` redraws each frame.

  Covers image sequences, evolving schedules, and scatter trajectories with
  one primitive:
    animate(lambda ax, i: ax.imshow(frames[i]), len(frames))
  Returns a matplotlib FuncAnimation (display with HTML(anim.to_jshtml())).
  """
  import matplotlib.pyplot as plt
  from matplotlib import animation as mpl_animation
  fig, ax = plt.subplots(figsize=figsize)

  def _frame(i):
    ax.clear()
    draw_fn(ax, i)
    return ()

  return mpl_animation.FuncAnimation(fig, _frame, frames=n_frames,
                                     interval=interval_ms, repeat=True)
