"""Model output container (parity: reference model_vdm.py:86-92)."""

from __future__ import annotations

import chex
import flax


@flax.struct.dataclass
class ELBOOutput:
  loss_recon: chex.Array  # (B,) nats
  loss_klz: chex.Array    # (B,) nats (latent KL + prior KL for MuLAN)
  loss_diff: chex.Array   # (B,) nats
  var_0: chex.Array       # scalar, mean sigmoid(gamma_0)
  var_1: chex.Array       # scalar, mean sigmoid(gamma_1)
