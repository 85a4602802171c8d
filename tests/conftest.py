"""Test harness: run everything on an 8-virtual-device CPU mesh.

Must set the env BEFORE jax initializes its backends, so this conftest is the
first import in the test session.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the session env pins a TPU
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# A sitecustomize in this image may import jax and register a TPU backend
# before this conftest runs; the config update below still wins as long as no
# backend has been initialized yet.
jax.config.update('jax_platforms', 'cpu')

# Match the reference's precision pin (main.py:39) for test determinism.
jax.config.update('jax_default_matmul_precision', 'float32')

import pytest  # noqa: E402

from mulan_tpu.models.config import ModelConfig  # noqa: E402


@pytest.fixture
def tiny_config():
  """A config small enough for fast CPU tests but exercising every code
  path (fourier features, attention off as in shipped configs, topk latent,
  polynomial schedule)."""
  return ModelConfig(
      vocab_size=256,
      image_size=8,
      image_channels=3,
      sm_n_embd=16,
      sm_n_layer=2,
      sm_pdrop=0.1,
      forward_n_layer=1,
      latent_size=10,
      latent_k=3,
      gamma_type='poly_fixedend',
      latent_type='topk',
      topk_noise_type='gamma',
      z_conditioning=True,
      reparam_type='true',
      antithetic_time_sampling=True,
      with_fourier_features=True,
      with_attention=False,
  )


@pytest.fixture
def rng():
  return jax.random.PRNGKey(0)
