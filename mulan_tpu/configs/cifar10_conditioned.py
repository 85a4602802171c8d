"""CIFAR-10 MuLAN-velocity config.

Parity: /root/reference/ldm/configs/cifar10-conditioned.py (hyperparameters
identical; extra `data.*` knobs select the data source since TFDS may be
absent, and `model.compute_dtype`/`use_pallas` select the TPU execution
policy).
"""

import ml_collections


def d(**kwargs):
  return ml_collections.ConfigDict(initial_dictionary=kwargs)


def get_config():
  config = ml_collections.ConfigDict()
  config.ckpt_restore_dir = 'None'

  config.data = d(
      dataset='cifar10',
      ignore_cache=False,
      data_dir='',
      synthetic_seed=0,
      synthetic_examples=4096,
  )

  config.vdm_type = 'mulan_velocity'

  config.model = d(
      unet_type='vdm',
      vocab_size=256,
      image_size=32,
      image_channels=3,
      sample_softmax=False,
      antithetic_time_sampling=True,
      with_fourier_features=True,
      with_attention=False,
      condition='input',
      encoder='unet',
      forward_n_layer=4,
      latent_size=50,
      latent_k=15,
      model_time=False,
      epsilon=0.0,
      monotone_layer='dense_monotone',
      gamma_type='poly_fixedend',
      latent_type='topk',
      z_conditioning=True,
      trace_matching=False,
      importance_sampling=False,
      topk_noise_type='gamma',
      sigma_prior=1.0,
      reparam_type='true',
      gamma_min=-13.3,
      gamma_max=5.0,
      velocity_from_epsilon=False,
      sigma_type='no_blur',
      sigma_min=0.0,
      sigma_max=20.0,
      sm_n_timesteps=0,
      sm_n_embd=128,
      sm_n_layer=32,
      sm_pdrop=0.1,
      # TPU execution policy
      compute_dtype='bfloat16',
      use_pallas=True,
      remat='none',  # 'none'|'all'|'attn'|'alt' (string so CLI overrides
      # work); for with_attention=True use 'attn' — measured best
      # (docs/PERF.md round 4)
      # gamma-MLP MXU pass count ('highest' = exact-f32 6-pass, 'high' =
      # 3-pass, ~2x rate; flip only with tools/tpu_checks.py
      # check_gamma_precision green) and batched dropout-mask generation
      # (one pallas_call for all 67 block masks; +2.1 GB residual at
      # batch 128) — see docs/PERF.md for the measured deltas.
      gamma_precision='highest',
      dropout_mask_batch=False,
  )

  config.training = d(
      seed=1,
      substeps=1000,
      num_steps_lr_warmup=100,
      num_steps_train=10_000_000,
      num_steps_eval=100,
      batch_size_train=128,
      batch_size_eval=128,
      steps_per_logging=1000,
      steps_per_eval=10_000,
      steps_per_save=10_000,
      profile=False,
      # Mesh knobs (beyond reference — pmap DP only): fsdp shards the
      # TrainState ZeRO-3-style over a 2nd mesh axis; tp adds column-
      # parallel tensor parallelism over a 3rd (parallel/mesh.py).
      fsdp=1,
      tp=1,
  )

  config.optimizer = d(
      name='adamw',
      args=d(
          b1=0.9,
          b2=0.99,
          eps=1e-8,
          weight_decay=0.01,
      ),
      learning_rate=2e-4,
      lr_decay=False,
      ema_rate=0.9999,
  )

  return config
