"""Utility tests: image grids, workdir naming, writers."""

import numpy as np

from mulan_tpu.utils import image_grid
from mulan_tpu.utils.metrics import ScalarLoggingWriter
from mulan_tpu.utils.workdir import get_workdir


def test_image_grid_shape():
  images = np.arange(16 * 4 * 4 * 3, dtype=np.uint8).reshape(16, 4, 4, 3)
  grid = image_grid(images)
  assert grid.shape == (16, 16, 3)
  # reference layout (utils.py:109): each row is reversed, so image 0 sits
  # at the top-RIGHT and image 3 at the top-left.
  np.testing.assert_array_equal(grid[:4, 12:], images[0])
  np.testing.assert_array_equal(grid[:4, :4], images[3])
  np.testing.assert_array_equal(grid[4:8, 12:], images[4])


def test_image_grid_non_square_batch():
  images = np.zeros((10, 4, 4, 3), np.uint8)
  assert image_grid(images).shape == (12, 12, 3)  # floor(sqrt(10)) = 3


def test_workdir_encodes_overrides():
  argv = ['prog', '--config=mulan_tpu/configs/cifar10_conditioned.py',
          '--workdir=/tmp/x', '--config.model.latent_k=5',
          '--config.training.batch_size_train=64']
  wd = get_workdir(argv)
  assert wd.startswith('cifar10_conditioned/')
  assert 'latent_k=5' in wd
  assert 'batch_size_train=64' in wd
  assert 'workdir' not in wd


def test_scalar_writer_reemits_header_on_key_change(caplog):
  import logging as pylogging
  writer = ScalarLoggingWriter()
  with caplog.at_level(pylogging.INFO):
    writer.write_scalars(1, {'a': 1.0, 'b': 2.0})
    writer.write_scalars(2, {'a': 1.5, 'b': 2.5})
    writer.write_scalars(3, {'c': 9.0})
  headers = [r for r in caplog.messages if r.startswith('Step')]
  assert len(headers) == 2  # once for {a,b}, once for {c}


def test_shard_host_padded_pad_exceeds_valid_rows():
  """A trailing chunk SMALLER than the device count must wrap-pad (pad >
  n_valid broke the old v[:pad] tiling) and keep the mask aligned."""
  import jax
  import numpy as np
  from mulan_tpu.parallel import mesh as mesh_lib
  mesh = mesh_lib.create_mesh()
  n_dev = mesh.devices.size
  assert n_dev == 8  # conftest virtual-device mesh
  for n_valid in (1, 3, 5, 8, 11):
    images = np.arange(n_valid, dtype=np.float32)[:, None] + 100
    put = mesh_lib.shard_host_padded(mesh, {'images': images})
    rows = np.asarray(put['images'])[:, 0]
    mask = np.asarray(put['mask'], bool)
    expect_len = -(-n_valid // n_dev) * n_dev
    assert rows.shape[0] == expect_len == mask.shape[0]
    np.testing.assert_array_equal(rows[mask], images[:, 0])  # valid rows first
    assert set(rows) <= set(images[:, 0])                    # pads are repeats
