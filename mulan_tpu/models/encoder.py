"""Auxiliary latent encoders q(z_x | x).

Parity: /root/reference/ldm/model_mulan_epsilon.py:24-157 — a UNet-downstack
encoder producing latent logits (`UnetEncoder`), a Gaussian two-head variant
(`UnetEncoderGaussian`), and a small CNN alternative.

The reference encoders embed a constant t=0 / conditioning=0 vector through
the same temb machinery as the score UNet (model_mulan_epsilon.py:106-115);
that is a constant per batch row, but it flows through learned Dense layers,
so we reproduce it exactly rather than folding it into a bias.
"""

from __future__ import annotations

from flax import linen as nn
import jax
import jax.numpy as jnp

from mulan_tpu.models.config import ModelConfig
from mulan_tpu.models.layers import (AttnBlock, GroupNormF32, ResnetBlock,
                                     base2_fourier_features, maybe_remat,
                                     timestep_embedding)


class _UnetTrunk(nn.Module):
  """Shared downstack: conv_in, forward_n_layer ResNet blocks, mid sandwich,
  zero-init 1-channel head, flattened through a swish."""

  config: ModelConfig

  @nn.compact
  def __call__(self, z, deterministic: bool):
    cfg = self.config
    dtype = cfg.dtype
    n_embd = cfg.sm_n_embd

    t = jnp.zeros((z.shape[0],), jnp.float32)
    cond_scalar = jnp.zeros((z.shape[0], 1), jnp.float32)
    temb = timestep_embedding(t, n_embd)
    cond = jnp.concatenate([temb, cond_scalar], axis=1)
    cond = nn.swish(nn.Dense(n_embd * 4, dtype=dtype, name='dense0')(cond))
    cond = nn.swish(nn.Dense(n_embd * 4, dtype=dtype, name='dense1')(cond))

    if cfg.with_fourier_features:
      z_f = base2_fourier_features(z, start=6, stop=8)
      h = jnp.concatenate([z, z_f], axis=-1)
    else:
      h = z
    h = h.astype(dtype)

    h = nn.Conv(n_embd, (3, 3), dtype=dtype, name='conv_in')(h)
    hs = [h]
    block_cls = maybe_remat(ResnetBlock, cfg.remat_blocks)
    attn_cls = nn.remat(AttnBlock) if cfg.remat_attn else AttnBlock
    for i in range(cfg.forward_n_layer):
      h = block_cls(out_ch=n_embd, pdrop=cfg.sm_pdrop, dtype=dtype,
                    hw_dropout=cfg.use_pallas,
                    name=f'down_block_{i}')(hs[-1], cond, deterministic)
      if cfg.with_attention:
        h = attn_cls(dtype=dtype, use_pallas=cfg.use_pallas,
                     name=f'down_attn_{i}')(h)
      hs.append(h)

    h = block_cls(pdrop=cfg.sm_pdrop, dtype=dtype,
                  hw_dropout=cfg.use_pallas,
                  name='mid_block_1')(hs[-1], cond, deterministic)
    h = attn_cls(dtype=dtype, use_pallas=cfg.use_pallas,
                 name='mid_attn_1')(h)
    h = block_cls(pdrop=cfg.sm_pdrop, dtype=dtype,
                  hw_dropout=cfg.use_pallas,
                  name='mid_block_2')(h, cond, deterministic)

    h = nn.swish(GroupNormF32(dtype=dtype)(h))
    h = nn.Conv(1, (3, 3), dtype=dtype, kernel_init=nn.initializers.zeros,
                name='conv_out')(h)
    return nn.swish(h.reshape(h.shape[0], -1).astype(jnp.float32))


class UnetEncoder(nn.Module):
  """Latent-logit encoder (model_mulan_epsilon.py:101-154)."""

  config: ModelConfig

  @nn.compact
  def __call__(self, z, deterministic: bool = True):
    h = _UnetTrunk(self.config, name='trunk')(z, deterministic)
    return nn.Dense(self.config.latent_size, name='dense_layer_final')(h)


class UnetEncoderGaussian(nn.Module):
  """Two-head (mu, softplus sigma) variant (model_mulan_epsilon.py:24-80)."""

  config: ModelConfig

  @nn.compact
  def __call__(self, z, deterministic: bool = True):
    h = _UnetTrunk(self.config, name='trunk')(z, deterministic)
    mu = nn.Dense(self.config.latent_size, name='dense_layer_final_mu')(h)
    sigma = nn.Dense(self.config.latent_size,
                     name='dense_layer_final_sigma')(h)
    return mu, jax.nn.softplus(sigma)


class CNNEncoder(nn.Module):
  """Small 2-conv encoder (`encoder='cnn'`, model_mulan_epsilon.py:83-98)."""

  config: ModelConfig

  @nn.compact
  def __call__(self, z, deterministic: bool = True):
    h = nn.relu(nn.Conv(32, (3, 3), padding='SAME', name='conv1')(z))
    h = nn.relu(nn.Conv(16, (3, 3), padding='SAME', name='conv2')(h))
    h = h.reshape(h.shape[0], -1)
    return nn.Dense(self.config.latent_size, name='dense')(h)


ENCODERS = {'cnn': CNNEncoder, 'unet': UnetEncoder}
