"""Frozen model configuration.

Mirrors the semantics of the reference `VDMConfig`
(/root/reference/ldm/model_vdm.py:33-82) with the reference's defects fixed:

  * `reparam_type` was declared twice (model_vdm.py:62 and :67); here it is a
    single `str` field whose default matches the winning declaration.
  * `unet_type` had a tuple default `'vdm',` (model_vdm.py:79); fixed to str.
  * the 32x32x3 resolution and the latent k=15 / latent_size=50 constants were
    hard-coded throughout model/eval code (model_mulan_epsilon.py:282,
    notebook_utils.py:548-551); here they are config fields (`image_size`,
    `image_channels`, `latent_size`, `latent_k`) with identical defaults.

New TPU-specific fields: `compute_dtype` (bf16 UNet compute with fp32
gamma/ELBO paths) and `use_pallas` (route hot ops through Pallas kernels).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import flax
import jax.numpy as jnp


@flax.struct.dataclass
class ModelConfig:
  """Static configuration of the VDM/MuLAN model family."""

  # data / decoder
  vocab_size: int = 256
  sample_softmax: bool = False
  image_size: int = 32
  image_channels: int = 3

  # time sampling & ELBO
  antithetic_time_sampling: bool = True
  sm_n_timesteps: int = 0  # 0 => continuous time

  # noise schedule
  gamma_type: str = 'poly_fixedend'
  gamma_min: float = -13.3
  gamma_max: float = 5.0

  # score model
  unet_type: str = 'vdm'  # 'vdm' (scalar-gamma UNet) | 'ldm' (per-pixel gamma)
  sm_n_embd: int = 128
  sm_n_layer: int = 32
  sm_pdrop: float = 0.1
  with_fourier_features: bool = True
  with_attention: bool = False

  # auxiliary latent encoder q(z_x | x)
  encoder: str = 'unet'  # 'unet' | 'cnn'
  forward_n_layer: int = 4
  latent_size: int = 50
  latent_k: int = 15
  latent_type: str = 'topk'  # 'topk' | 'gumbel' | 'gaussian'
  topk_noise_type: str = 'gamma'  # 'gamma' | 'gumbel'
  # Two reference meanings (the field is shared across the zoo):
  #   * MuLAN models: 'true' => learned latent embedding; anything else =>
  #     one_hot(labels) embeddings (model_mulan_epsilon.py:301-306).
  #   * scalar VDM: output parameterization — 'input' => the score model
  #     predicts x-hat (discrete-time weighting model_vdm.py:167-168 and the
  #     sampler's x-hat->eps-hat conversion :197-201); any other value =>
  #     the model predicts eps (the reference field default 'noise',
  #     model_vdm.py:67; the reference raises NameError for values outside
  #     {'noise','input'} on those paths — here they fall through to 'noise').
  reparam_type: str = 'true'
  z_conditioning: bool = True
  condition: str = 'input'

  # velocity parameterization
  velocity_from_epsilon: bool = False

  # sampling
  sigma_prior: float = 1.0

  # misc reference-parity fields (kept for config-surface parity)
  epsilon: float = 0.0
  model_time: bool = False
  monotone_layer: str = 'dense_monotone'
  importance_sampling: bool = False
  trace_matching: bool = False
  sigma_type: str = 'no_blur'
  sigma_min: float = 0.0
  sigma_max: float = 20.0

  # TPU execution policy (new in this framework)
  compute_dtype: str = 'float32'  # 'float32' | 'bfloat16' (UNet compute only)
  use_pallas: bool = False        # route hot ops through Pallas kernels
  # jax.checkpoint the UNet blocks: False/'none' | True/'all' |
  # 'attn' (attention blocks only — their flash residuals dominate the HBM
  # blow-up at with_attention=True while the ResNet convs dominate FLOPs,
  # so attn-only remat keeps most of the memory win without recomputing the
  # convs) | 'alt' (attention blocks + every other ResNet block — the
  # middle dial when attn-only still exceeds HBM; measured in docs/PERF.md).
  remat: Any = False
  # MXU pass count for the gamma-MLP matmuls. Storage/accumulation stays
  # float32 either way; 'highest' = 6-pass bf16 (exact f32 emulation, the
  # reference's pinned fp32-matmul behavior), 'high' = 3-pass bf16 (~2x MXU
  # rate, ~1e-7 relative matmul error — validated on hardware by
  # tools/tpu_checks.py check_gamma_precision before use).
  gamma_precision: str = 'highest'  # 'highest' | 'high' | 'default'
  # Generate ALL ResNet-block dropout masks in one pallas_call per UNet
  # forward instead of one (fwd) + one (bwd regeneration) per block. Trades
  # +n_blocks * activation-size HBM residual for ~130 fewer kernel launches
  # per train step (docs/NEXT.md item 2). Only active with use_pallas.
  dropout_mask_batch: bool = False
  # SURVEY §7 north-star kernel #1 prototype: compute each ResNet block's
  # GN -> swish prologue as ONE Pallas pass (MXU-matmul group stats +
  # in-VMEM normalize/swish, ops/groupnorm_swish.py) instead of the XLA
  # loop-fusion chain. Measured accept/reject in docs/PERF.md round 5.
  fused_gn_swish: bool = False

  @property
  def remat_blocks(self) -> bool:
    if self.remat in (False, 'none', 'attn', 'alt'):
      return False
    if self.remat in (True, 'all'):
      return True
    raise ValueError(f'unknown remat mode: {self.remat!r}')

  @property
  def remat_attn(self) -> bool:
    if self.remat in (False, 'none'):
      return False
    if self.remat in (True, 'all', 'attn', 'alt'):
      return True
    raise ValueError(f'unknown remat mode: {self.remat!r}')

  @property
  def remat_alt_blocks(self) -> bool:
    """Checkpoint every other ResNet block (only the 'alt' mode)."""
    if self.remat in (False, 'none', 'attn', True, 'all'):
      return False
    if self.remat == 'alt':
      return True
    raise ValueError(f'unknown remat mode: {self.remat!r}')

  @property
  def gamma_matmul_precision(self):
    import jax
    return {
        'highest': jax.lax.Precision.HIGHEST,
        'high': jax.lax.Precision.HIGH,
        'default': jax.lax.Precision.DEFAULT,
    }[self.gamma_precision]

  @property
  def n_pixels(self) -> int:
    return self.image_size * self.image_size * self.image_channels

  @property
  def image_shape(self):
    return (self.image_size, self.image_size, self.image_channels)

  @property
  def dtype(self):
    return jnp.dtype(self.compute_dtype)


# Fields the reference's config dicts carry that map 1:1 onto ModelConfig.
_KNOWN_FIELDS = {f.name for f in dataclasses.fields(ModelConfig)}


def model_config_from_dict(d: Mapping[str, Any]) -> ModelConfig:
  """Build a ModelConfig from a (reference-shaped) config.model dict.

  Unknown keys are ignored so that reference config files (which carry extra
  fields like `nn_input` or `loss_type`) load unchanged.
  """
  kwargs = {k: v for k, v in dict(d).items() if k in _KNOWN_FIELDS}
  return ModelConfig(**kwargs)
