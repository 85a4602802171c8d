"""Denoiser UNets.

One module covers both reference variants:
  * `per_pixel_gamma=False` — the VDM `ScoreUNet`
    (/root/reference/ldm/model_vdm.py:309-388): scalar gamma_t per example,
    sinusoidal-embedded into a per-example conditioning vector.
  * `per_pixel_gamma=True` — the LDM-style UNet
    (/root/reference/ldm/ldm_unet.py:64-141): full per-pixel gamma map,
    embedded per pixel and injected as a per-pixel bias in each ResNet block.

Architecture (identical in both): no spatial down/upsampling — `n_layer`
ResNet blocks at full resolution with a skip stack, a middle
ResNet-Attn-ResNet sandwich, `n_layer+1` up blocks consuming concat-skips,
and a zero-init output conv with the residual base measure `eps_pred += z`.

TPU policy: block compute runs in `config.compute_dtype` (bf16 on TPU keeps
the 3x3 convs on the MXU at full rate); the input `z`, the final residual add
and the conditioning-embedding trigonometry stay float32. Optional
`config.remat` checkpoints every ResNet block to trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

from mulan_tpu.models.config import ModelConfig
from mulan_tpu.models.layers import (AttnBlock, GroupNormF32, ResnetBlock,
                                     base2_fourier_features, maybe_remat,
                                     timestep_embedding)
from mulan_tpu.parallel.mesh import constrain_activation_channels


class UNet(nn.Module):
  config: ModelConfig
  per_pixel_gamma: bool = False
  n_layer: int = -1  # -1 => config.sm_n_layer
  # Tensor-parallel mesh: when set (by Experiment, via build_model), block
  # activations pin their channel axis to its 'tensor' axis; None = identity.
  tensor_mesh: Optional[Mesh] = None

  @nn.compact
  def __call__(self, z, g_t, conditioning, deterministic: bool = True):
    cfg = self.config
    dtype = cfg.dtype
    n_layers = cfg.sm_n_layer if self.n_layer == -1 else self.n_layer
    n_embd = cfg.sm_n_embd

    z = z.astype(jnp.float32)
    # Normalize gamma into [0, 1] "time" (reference model_vdm.py:325-327).
    t = (jnp.asarray(g_t, jnp.float32) - cfg.gamma_min) / (
        cfg.gamma_max - cfg.gamma_min)

    if self.per_pixel_gamma:
      # t: (B, H, W, C) -> per-pixel sinusoidal embedding, conditioning
      # broadcast over space (ldm_unet.py:82-90).
      b, hgt, wid, c = z.shape
      assert t.shape == z.shape, (t.shape, z.shape)
      temb = timestep_embedding(t.reshape(-1), n_embd)
      temb = temb.reshape(b, hgt, wid, c * n_embd)
      cond_in = jnp.broadcast_to(
          conditioning[:, None, None, :].astype(temb.dtype),
          (b, hgt, wid, conditioning.shape[-1]))
      cond = jnp.concatenate([temb, cond_in], axis=-1)
    else:
      # t: (B,) scalar per example (model_vdm.py:329-338).
      if t.ndim == 0:
        t = jnp.full((z.shape[0],), t)
      temb = timestep_embedding(t, n_embd)
      cond = jnp.concatenate(
          [temb, conditioning.astype(temb.dtype)], axis=-1)

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
    alt_block_cls = maybe_remat(ResnetBlock, True)  # remat='alt' even blocks
    # Attention residuals are big: flash saves an f32 (B, heads, T, 128)
    # logsumexp per block — 64 MB/block at flagship shapes, OOM with
    # with_attention=True (66 blocks) at batch 128 without remat
    # (remat='attn' checkpoints only these, keeping the conv FLOPs).
    attn_cls = nn.remat(AttnBlock) if cfg.remat_attn else AttnBlock

    # Batched mask generation: every block's dropout mask has the same
    # (B, H, W, n_embd) shape (all blocks project to n_embd before the
    # dropout site), so one pallas_call can emit all of them
    # (config.dropout_mask_batch; see ops/dropout.py hw_mask_batch).
    masks = None
    if (cfg.dropout_mask_batch and cfg.use_pallas and cfg.sm_pdrop > 0
        and not deterministic):
      from mulan_tpu.ops.dropout import hw_mask_batch, seed_from_key
      n_blocks = 2 * n_layers + 3  # down + mid(2) + up blocks
      masks = hw_mask_batch(
          seed_from_key(self.make_rng('dropout')), n_blocks,
          (z.shape[0], z.shape[1], z.shape[2], n_embd), cfg.sm_pdrop, dtype)
    block_idx = [0]

    n_res = [0]

    def res_block(name, h, out_ch=None):
      mask = None
      if masks is not None:
        mask = masks[block_idx[0]]
        block_idx[0] += 1
      cls = block_cls
      if cfg.remat_alt_blocks and n_res[0] % 2 == 0:
        cls = alt_block_cls
      n_res[0] += 1
      h = cls(out_ch=out_ch, pdrop=cfg.sm_pdrop, dtype=dtype,
              hw_dropout=cfg.use_pallas, fused_gn=cfg.fused_gn_swish,
              name=name)(h, cond, deterministic, mask)
      # Under tensor parallelism, pin the channel-sharded layout that the
      # column-parallel conv kernels produce (identity on tp=1 meshes).
      return constrain_activation_channels(h, self.tensor_mesh)

    for i in range(n_layers):
      h = res_block(f'down_block_{i}', hs[-1], out_ch=n_embd)
      if cfg.with_attention:
        h = constrain_activation_channels(
            attn_cls(dtype=dtype, use_pallas=cfg.use_pallas,
                     name=f'down_attn_{i}')(h), self.tensor_mesh)
      hs.append(h)

    h = res_block('mid_block_1', hs[-1])
    h = constrain_activation_channels(
        attn_cls(dtype=dtype, use_pallas=cfg.use_pallas,
                 name='mid_attn_1')(h), self.tensor_mesh)
    h = res_block('mid_block_2', h)

    for i in range(n_layers + 1):
      h = res_block(f'up_block_{i}',
                    jnp.concatenate([h, hs.pop()], axis=-1), out_ch=n_embd)
      if cfg.with_attention:
        h = constrain_activation_channels(
            attn_cls(dtype=dtype, use_pallas=cfg.use_pallas,
                     name=f'up_attn_{i}')(h), self.tensor_mesh)
    assert not hs
    if masks is not None:
      assert block_idx[0] == masks.shape[0], (block_idx[0], masks.shape)

    h = nn.swish(GroupNormF32(dtype=dtype)(h))
    eps_pred = nn.Conv(z.shape[-1], (3, 3), dtype=dtype,
                       kernel_init=nn.initializers.zeros,
                       name='conv_out')(h)
    # Residual base measure (model_vdm.py:386-388), in float32.
    return eps_pred.astype(jnp.float32) + z
