"""Metric writers and image grids.

Parity: /root/reference/ldm/utils.py:101-202 — process-0 gets an async
(CSV-style stdout + TensorBoard) multi-writer, other processes log-only;
`image_grid` packs sqrt(B) x sqrt(B) samples into one image.
"""

from __future__ import annotations

from typing import Any, Mapping

from absl import logging
import numpy as np


def image_grid(images) -> np.ndarray:
  """(B, H, W, C) -> (G*H, G*W, C) with G = floor(sqrt(B)).

  Sample order matches the reference exactly (utils.py:109 reverses each
  hstack'd row, so every row lays its samples out right-to-left)."""
  images = np.asarray(images)
  g = int(np.floor(np.sqrt(images.shape[0])))
  images = images[:g * g]
  _, h, w, c = images.shape
  grid = images.reshape(g, g, h, w, c)[:, ::-1].transpose(0, 2, 1, 3, 4)
  return grid.reshape(g * h, g * w, c)


class ScalarLoggingWriter:
  """CSV-style stdout scalar writer (reference CustomLoggingWriter)."""

  def __init__(self):
    self._last_keys = None

  def write_scalars(self, step: int, scalars: Mapping[str, Any]):
    keys = sorted(scalars.keys())
    if keys != self._last_keys:  # re-emit header when the key set changes
      logging.info('%s', ', '.join(['Step'] + keys))
      self._last_keys = keys
    vals = [float(np.asarray(scalars[k])) for k in keys]
    logging.info('%d, %s', step, ', '.join(f'{v:.4f}' for v in vals))

  def write_images(self, step: int, images: Mapping[str, Any]):
    logging.info('[%d] images: %s', step,
                 {k: np.asarray(v).shape for k, v in images.items()})

  def write_hparams(self, hparams: Mapping[str, Any]):
    logging.info('Hyperparameters:\n%s', hparams)

  def flush(self):
    pass

  def close(self):
    pass


class MultiWriter:
  def __init__(self, writers):
    self._writers = writers

  def __getattr__(self, name):
    def call(*args, **kwargs):
      for w in self._writers:
        getattr(w, name, lambda *a, **k: None)(*args, **kwargs)
    return call


def create_writer(workdir: str, process_index: int):
  """Process 0: stdout + TensorBoard (if clu/tf available); others: stdout
  only (the reference silences them entirely; keeping absl logging here is
  strictly more observable)."""
  if process_index > 0:
    return ScalarLoggingWriter()
  writers = [ScalarLoggingWriter()]
  try:
    from clu.metric_writers.summary_writer import SummaryWriter
    writers.append(SummaryWriter(workdir))
  except Exception:  # pragma: no cover - TF summary optional
    logging.info('TensorBoard SummaryWriter unavailable; stdout only')
  return MultiWriter(writers)
