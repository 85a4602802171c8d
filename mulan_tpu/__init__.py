"""mulan_tpu — a TPU-native JAX framework for MuLAN.

A from-scratch reimplementation of the capabilities of s-sahoo/MuLAN
("Diffusion Models With Learned Adaptive Noise", arXiv:2312.13236) designed
for TPU hardware: jit + NamedSharding data parallelism over a device mesh,
scan-fused training super-steps, Pallas kernels on the hot paths, and a fully
on-device likelihood-evaluation suite (sparse VLB, dense per-timestep VLB,
exact NLL via an on-device probability-flow ODE solver).

Layout:
  models/    model zoo: EncDec, ScoreUNet, LDM-UNet, latent encoders,
             noise-schedule networks, scalar VDM, MuLAN (epsilon & velocity)
  ops/       Pallas TPU kernels + on-device adaptive ODE solver
  parallel/  mesh construction and sharding policy
  train/     train state (EMA), optimizer factory, jit(scan) training loop
  data/      input pipeline (TFDS-gated, local arrays, synthetic)
  evals/     sparse/dense VLB and exact-NLL ODE evaluation, samplers
  utils/     metrics writers, image grids, workdir naming
"""

__version__ = "0.1.0"
