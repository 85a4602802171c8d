"""Input pipeline.

Replaces the reference's TFDS + clu.deterministic_data pipeline
(/root/reference/ldm/dataset.py) with a host-local numpy pipeline feeding the
jit'd train step:

  * train batches carry a `substeps` axis — one host-level `next()` feeds a
    whole jit(scan) super-step, preserving the reference's dispatch
    amortization (dataset.py:266) WITHOUT the pmap leading-device axis: the
    yielded shape is (substeps, per_host_batch, H, W, C); device placement and
    cross-chip sharding are handled by NamedSharding (parallel.mesh), not by
    batch dims;
  * per-host data sharding mirrors `get_read_instruction_for_host`
    (dataset.py:264-265): each process reads an equal contiguous slice of the
    example index space;
  * images stay uint8 end-to-end; dequantize/encode happens on device;
  * a background thread keeps a small prefetch queue so host epochs overlap
    device compute.

Sources: TFDS (gated on the package + prepared data being present), a local
.npz directory, a memory-mapped .npy directory (streams batches off disk —
the path for datasets too large to hold resident, e.g. imagenet64 at
~16 GB/host), or deterministic synthetic data (tests/benchmarks — the
hermetic default in environments without dataset access).

Dataset keys supported (parity with dataset.py:65-246): cifar10, cifar10_aug,
imagenet32 (TFDS `downsampled_imagenet/32x32`), imagenet64, fashion_mnist32,
plus `synthetic`, `npz:<path>` (in-RAM) and `npy:<path>` (memmap streaming;
see `export_npy_memmap` for the one-time conversion).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass
class ArraySource:
  """In-(host-)memory dataset: uint8 images + integer labels."""

  images: np.ndarray  # (N, H, W, C) uint8
  labels: np.ndarray  # (N,) int32

  def __post_init__(self):
    assert self.images.dtype == np.uint8, self.images.dtype
    assert self.images.ndim == 4
    self.labels = np.asarray(self.labels, np.int32)
    assert len(self.labels) == len(self.images)

  def __len__(self):
    return len(self.images)

  def host_shard(self, process_index: int, process_count: int
                 ) -> 'ArraySource':
    """Equal contiguous per-host slice (dataset.py:264-265 semantics)."""
    n = len(self) // process_count
    lo = process_index * n
    return ArraySource(self.images[lo:lo + n], self.labels[lo:lo + n])


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------

_TFDS_NAMES = {
    'cifar10': ('cifar10', 'train', 'test'),
    'cifar10_aug': ('cifar10', 'train', 'test'),
    'cifar10_aug_with_channel': ('cifar10', 'train', 'test'),
    'cifar10_splitfreq': ('cifar10', 'train', 'test'),
    'cifar10_bothfreq': ('cifar10', 'train', 'test'),
    'cifar10_splitintensity': ('cifar10', 'train', 'test'),
    'imagenet32': ('downsampled_imagenet/32x32', 'train', 'validation'),
    'imagenet32r': ('imagenet_resized/32x32', 'train', 'validation'),
    'imagenet64': ('downsampled_imagenet/64x64', 'train', 'validation'),
    'fashion_mnist32': ('fashion_mnist', 'train', 'test'),
}


def split_image_freqs(images: np.ndarray, cutoff_frequency: float = 0.06):
  """Low/high-pass split via gaussian blur (reference dataset.py:29-62).

  Vectorized over the batch with scipy.ndimage instead of per-image
  tfa.image.gaussian_filter2d; same (sigma, radius) derivation.
  """
  import scipy.ndimage
  h, w = images.shape[1:3]
  sigma = cutoff_frequency * min(h, w)
  imgs = images.astype(np.float32)
  blurred = scipy.ndimage.gaussian_filter(
      imgs, sigma=(0, sigma, sigma, 0), mode='nearest')
  blurred = np.clip(blurred, 0, 255).astype(np.uint8)
  low = blurred
  high = images - np.minimum(blurred, images)
  return low, high


def _apply_variant(dataset: str, split: str, src: ArraySource
                   ) -> ArraySource:
  """Static dataset transforms (dataset.py:324-343 split variants)."""
  if dataset in ('cifar10_splitfreq', 'cifar10_bothfreq'):
    low, high = split_image_freqs(src.images)
    h = src.images.shape[1]
    if dataset == 'cifar10_splitfreq':
      images = np.concatenate([low[:, :h // 2], high[:, h // 2:]], axis=1)
    else:
      images = np.concatenate([low, high], axis=1)
    return ArraySource(images, src.labels)
  if dataset == 'cifar10_splitintensity':
    h = src.images.shape[1]
    images = src.images.copy()
    lo_lbl = src.labels < 5
    images[lo_lbl, :h // 2] = 127
    images[~lo_lbl, h // 2:] = 127
    return ArraySource(images, src.labels)
  return src


def _load_tfds(name: str, split: str, data_dir: Optional[str]) -> ArraySource:
  import tensorflow_datasets as tfds  # gated import
  builder = tfds.builder(name, data_dir=data_dir)
  builder.download_and_prepare()
  ds = tfds.as_numpy(builder.as_dataset(split=split, batch_size=-1))
  images = np.asarray(ds['image'], np.uint8)
  labels = np.asarray(ds.get('label', np.zeros(len(images))), np.int32)
  return ArraySource(images, labels)


def _iter_tfds_chunks(name: str, split: str, data_dir: Optional[str],
                      chunk_rows: int):
  """Yield (n_total, iterator of (images, labels) uint8/int32 chunks) for a
  TFDS split WITHOUT materializing it in RAM (batch_size=-1 loads ~16 GB/host
  for imagenet64, reference dataset.py:228-236)."""
  import tensorflow_datasets as tfds  # gated import
  builder = tfds.builder(name, data_dir=data_dir)
  builder.download_and_prepare()
  n_total = builder.info.splits[split].num_examples

  def chunks():
    ds = tfds.as_numpy(builder.as_dataset(split=split,
                                          batch_size=chunk_rows))
    for batch in ds:
      images = np.asarray(batch['image'], np.uint8)
      labels = np.asarray(
          batch.get('label', np.zeros(len(images))), np.int32)
      yield images, labels

  return n_total, chunks()


def _load_npz(path: str, split: str) -> ArraySource:
  data = np.load(os.path.join(path, f'{split}.npz'))
  labels = data['labels'] if 'labels' in data else np.zeros(
      len(data['images']))
  return ArraySource(np.asarray(data['images'], np.uint8), labels)


def _load_npy_memmap(path: str, split: str) -> ArraySource:
  """Memory-mapped source: `<path>/<split>_images.npy` (uint8 NHWC) +
  optional `<path>/<split>_labels.npy`.

  The images array is an np.memmap — batches are read off disk on demand
  (train_iterator's fancy indexing materializes only the selected rows), so
  imagenet64-scale datasets (~16 GB) never need to be host-RAM resident.
  `host_shard`'s basic slicing preserves the memmap, so each host maps only
  its contiguous byte range. Export format via `export_npy_memmap`.
  """
  images = np.load(os.path.join(path, f'{split}_images.npy'), mmap_mode='r')
  labels_path = os.path.join(path, f'{split}_labels.npy')
  labels = (np.load(labels_path) if os.path.exists(labels_path)
            else np.zeros(len(images)))
  return ArraySource(images, labels)


def export_npy_memmap(source, path: str, split: str, *,
                      n_total: Optional[int] = None,
                      image_shape: Optional[Tuple[int, ...]] = None) -> None:
  """Write a source in the `npy:<path>` memmap layout (one-time conversion
  of a TFDS/npz dataset for streaming training).

  STREAMING: images are written slice-by-slice into an
  `np.lib.format.open_memmap` destination, so the source never needs to be
  RAM-resident — required for imagenet64 (~16 GB/host,
  reference dataset.py:228-236). `source` is either an ArraySource (written
  in bounded slices; works for np.memmap-backed sources) or an iterator of
  (images, labels) uint8/int32 chunks, in which case `n_total` and
  `image_shape` (H, W, C) must be given (see `export_tfds_npy`).
  """
  os.makedirs(path, exist_ok=True)
  if isinstance(source, ArraySource):
    array_src = source
    n_total = len(array_src)
    image_shape = array_src.images.shape[1:]
    chunk = 4096

    def chunks():
      for lo in range(0, n_total, chunk):
        yield (array_src.images[lo:lo + chunk],
               array_src.labels[lo:lo + chunk])

    source = chunks()
  elif n_total is None or image_shape is None:
    raise ValueError('chunk-iterator export needs n_total and image_shape')

  images_out = np.lib.format.open_memmap(
      os.path.join(path, f'{split}_images.npy'), mode='w+', dtype=np.uint8,
      shape=(n_total, *image_shape))
  labels_out = np.zeros((n_total,), np.int32)
  row = 0
  for images, labels in source:
    n = len(images)
    if row + n > n_total:
      raise ValueError(f'source yielded more than n_total={n_total} rows')
    images_out[row:row + n] = images
    labels_out[row:row + n] = labels
    row += n
  if row != n_total:
    raise ValueError(f'source yielded {row} rows, expected {n_total}')
  images_out.flush()
  del images_out  # close the memmap before anyone re-opens it read-only
  np.save(os.path.join(path, f'{split}_labels.npy'), labels_out)


def export_tfds_npy(dataset: str, split: str, path: str, *,
                    data_dir: Optional[str] = None,
                    chunk_rows: int = 4096) -> None:
  """One-time streaming TFDS -> `npy:<path>` conversion: peak host RAM is
  one `chunk_rows` slice (~50 MB at imagenet64 shapes), not the dataset."""
  if dataset not in _TFDS_NAMES:
    raise ValueError(f'unknown TFDS dataset key: {dataset!r}')
  tfds_name, train_split, eval_split = _TFDS_NAMES[dataset]
  tfds_split = train_split if split == 'train' else eval_split
  n_total, chunks = _iter_tfds_chunks(tfds_name, tfds_split, data_dir,
                                      chunk_rows)
  first = next(chunks)

  def with_first():
    yield first
    yield from chunks

  export_npy_memmap(with_first(), path, split, n_total=n_total,
                    image_shape=first[0].shape[1:])


def _synthetic(seed: int, n: int, image_shape) -> ArraySource:
  rng = np.random.default_rng(seed)
  # Low-frequency blobs rather than white noise so losses are non-trivial.
  h, w, c = image_shape
  base = rng.integers(0, 256, size=(n, 4, 4, c)).astype(np.float32)
  images = np.repeat(np.repeat(base, h // 4, axis=1), w // 4, axis=2)
  images += rng.normal(0, 8, size=(n, h, w, c))
  labels = rng.integers(0, 10, size=(n,))
  return ArraySource(np.clip(images, 0, 255).astype(np.uint8), labels)


def _resize_all(src: ArraySource, size: int) -> ArraySource:
  """Antialiased resize of every image (reference resize=32 preprocessing)."""
  if src.images.shape[1] == size and src.images.shape[2] == size:
    return src
  import PIL.Image
  out = np.zeros((len(src), size, size, src.images.shape[-1]), np.uint8)
  for i, img in enumerate(src.images):
    out[i] = np.asarray(
        PIL.Image.fromarray(img).resize((size, size), PIL.Image.BILINEAR))
  return ArraySource(out, src.labels)


def _postprocess(name: str, src: ArraySource, image_size: int) -> ArraySource:
  if name == 'fashion_mnist32':
    # Resize 28 -> image_size and repeat to 3 channels (dataset.py:345-356).
    import PIL.Image
    out = np.zeros((len(src), image_size, image_size, 1), np.uint8)
    for i, img in enumerate(src.images):
      out[i, :, :, 0] = np.asarray(
          PIL.Image.fromarray(img[:, :, 0]).resize(
              (image_size, image_size), PIL.Image.BILINEAR))
    return ArraySource(np.repeat(out, 3, axis=-1), src.labels)
  return src


def load_source(dataset: str, split: str, *, image_shape=(32, 32, 3),
                data_dir: Optional[str] = None, synthetic_seed: int = 0,
                synthetic_examples: int = 4096) -> ArraySource:
  if dataset == 'synthetic':
    seed = synthetic_seed if split == 'train' else synthetic_seed + 1
    n = synthetic_examples if split == 'train' else synthetic_examples // 4
    return _synthetic(seed, n, image_shape)
  if dataset.startswith('npz:'):
    return _load_npz(dataset[len('npz:'):], split)
  if dataset.startswith('npy:'):
    return _load_npy_memmap(dataset[len('npy:'):], split)
  if dataset == 'dtd_shapes3d':
    # Mixture of two TFDS sets, resized, with offset dtd labels
    # (dataset.py:139-171).
    dtd = _resize_all(
        _load_tfds('dtd', 'train' if split == 'train' else 'test',
                   data_dir), image_shape[0])
    # shapes3d has no test split (reference dataset.py:161 uses 'train')
    shapes = _resize_all(_load_tfds('shapes3d', 'train', data_dir),
                         image_shape[0])
    n_shape_labels = int(shapes.labels.max()) + 1
    dtd = ArraySource(dtd.images, dtd.labels + n_shape_labels)
    rng = np.random.default_rng(0)
    images = np.concatenate([dtd.images, shapes.images])
    labels = np.concatenate([dtd.labels, shapes.labels])
    order = rng.permutation(len(images))
    return ArraySource(images[order], labels[order])
  if dataset in _TFDS_NAMES:
    tfds_name, train_split, eval_split = _TFDS_NAMES[dataset]
    tfds_split = train_split if split == 'train' else eval_split
    try:
      src = _load_tfds(tfds_name, tfds_split, data_dir)
    except (ImportError, ModuleNotFoundError) as e:
      raise RuntimeError(
          f'dataset {dataset!r} needs tensorflow_datasets, which is not '
          f'installed; use dataset="synthetic" or "npz:<dir>"') from e
    src = _postprocess(dataset, src, image_shape[0])
    return _apply_variant(dataset, split, src)
  raise ValueError(f'unknown dataset: {dataset!r}')


# ---------------------------------------------------------------------------
# Augmentation (cifar10_aug parity, dataset.py:358-376)
# ---------------------------------------------------------------------------


def augment_batch(rng: np.random.Generator, images: np.ndarray,
                  channel_flip: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray]:
  """Random left/right flips and 90-degree rotations (dataset.py:358-376);
  with `channel_flip`, additionally a random color-channel permutation
  (dataset.py:413-440). Returns (images, aug bit) where the bit feeds the
  model's `conditioning` input."""
  n = len(images)
  out = images.copy()
  flip = rng.random(n) > 0.5
  out[flip] = out[flip, :, ::-1]
  do_rot = rng.random(n) > 0.5
  ks = rng.integers(1, 4, size=n)
  for k in (1, 2, 3):
    sel = do_rot & (ks == k)
    if sel.any():
      out[sel] = np.rot90(out[sel], k=k, axes=(1, 2))
  aug = flip | do_rot
  if channel_flip:
    do_ch = rng.random(n) > 0.5
    for i in np.where(do_ch)[0]:
      out[i] = out[i][:, :, rng.permutation(out.shape[-1])]
    aug = aug | do_ch
  return out, aug.astype(np.uint8)


# ---------------------------------------------------------------------------
# Iterators
# ---------------------------------------------------------------------------


def _prefetch(gen: Iterator, depth: int = 2) -> Iterator:
  q: queue.Queue = queue.Queue(maxsize=depth)
  sentinel = object()

  def worker():
    for item in gen:
      q.put(item)
    q.put(sentinel)

  threading.Thread(target=worker, daemon=True).start()
  while True:
    item = q.get()
    if item is sentinel:
      return
    yield item


def train_iterator(source: ArraySource, *, batch_size: int, substeps: int,
                   seed: int, augment: bool = False,
                   channel_flip: bool = False,
                   prefetch: bool = True) -> Iterator[dict]:
  """Infinite shuffled super-batches: each item holds `substeps` optimizer
  steps of `batch_size` examples (per host)."""
  rng = np.random.default_rng(seed)
  chunk = batch_size * substeps

  def gen():
    order = np.array([], dtype=np.int64)
    while True:
      while len(order) < chunk:
        order = np.concatenate([order, rng.permutation(len(source))])
      idx, order_rest = order[:chunk], order[chunk:]
      order = order_rest
      images = source.images[idx]
      cond = np.zeros(chunk, np.uint8)
      if augment:
        images, cond = augment_batch(rng, images, channel_flip=channel_flip)
      yield {
          'images': images.reshape(substeps, batch_size,
                                   *source.images.shape[1:]),
          'labels': source.labels[idx].reshape(substeps, batch_size),
          'conditioning': cond.reshape(substeps, batch_size),
      }

  return _prefetch(gen()) if prefetch else gen()


def eval_iterator(source: ArraySource, *, batch_size: int, seed: int,
                  prefetch: bool = True) -> Iterator[dict]:
  """Infinite shuffled eval batches (no substeps axis)."""
  rng = np.random.default_rng(seed)

  def gen():
    while True:
      order = rng.permutation(len(source))
      for lo in range(0, len(source) - batch_size + 1, batch_size):
        idx = order[lo:lo + batch_size]
        yield {
            'images': source.images[idx],
            'labels': source.labels[idx],
            'conditioning': np.zeros(batch_size, np.uint8),
        }

  return _prefetch(gen()) if prefetch else gen()


def one_time_eval_iterator(source: ArraySource, *, batch_size: int
                           ) -> Iterator[dict]:
  """Finite, UNSHUFFLED pass over the eval split (dataset.py:379-410); used
  by every BPD estimator. Trailing remainder examples are dropped, matching
  the reference's fixed batch_dims behavior."""
  for lo in range(0, len(source) - batch_size + 1, batch_size):
    sl = slice(lo, lo + batch_size)
    yield {
        'images': source.images[sl],
        'labels': source.labels[sl],
        'conditioning': np.zeros(batch_size, np.uint8),
    }


# ---------------------------------------------------------------------------
# Config-level entry points (parity: dataset.py create_dataset /
# create_one_time_eval_dataset)
# ---------------------------------------------------------------------------


def _sources_from_config(config, split: str) -> ArraySource:
  data_cfg = config.data
  image_shape = (config.model.get('image_size', 32),
                 config.model.get('image_size', 32),
                 config.model.get('image_channels', 3))
  src = load_source(
      data_cfg.dataset, split,
      image_shape=image_shape,
      data_dir=data_cfg.get('data_dir', None),
      synthetic_seed=data_cfg.get('synthetic_seed', 0),
      synthetic_examples=data_cfg.get('synthetic_examples', 4096))
  return src.host_shard(jax.process_index(), jax.process_count())


def create_dataset(config, seed: int):
  """(train_iter, eval_iter) of per-host numpy batches."""
  train_src = _sources_from_config(config, 'train')
  eval_src = _sources_from_config(config, 'eval')
  per_host_train = config.training.batch_size_train // jax.process_count()
  per_host_eval = config.training.batch_size_eval // jax.process_count()
  augment = '_aug' in config.data.dataset
  channel_flip = config.data.dataset.endswith('with_channel')
  train_it = train_iterator(
      train_src, batch_size=per_host_train,
      substeps=config.training.substeps,
      seed=seed + jax.process_index(), augment=augment,
      channel_flip=channel_flip)
  eval_it = eval_iterator(eval_src, batch_size=per_host_eval,
                          seed=seed + 7919 + jax.process_index())
  return train_it, eval_it


def create_one_time_eval_dataset(config, batch_size: Optional[int] = None):
  src = _sources_from_config(config, 'eval')
  if batch_size is None:
    batch_size = config.training.batch_size_eval
  return one_time_eval_iterator(
      src, batch_size=batch_size // jax.process_count())
