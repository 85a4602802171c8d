"""Baseline scalar-gamma VDM (continuous or discrete time).

Parity: /root/reference/ldm/model_vdm.py:95-259 (`VDM`). The noise schedule
gamma(t) is a scalar function of t (learnable scalar / fixed linear /
monotone MLP); the ELBO, ancestral sampler, SDE and probability-flow ODE all
match the reference formulas. dgamma/dt comes from each schedule's
`gamma_and_dgamma` (analytic where closed-form, jvp otherwise) instead of a
jvp at the loss site.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mulan_tpu.models import encdec as encdec_lib
from mulan_tpu.models.config import ModelConfig
from mulan_tpu.models.outputs import ELBOOutput
from mulan_tpu.models.schedules import SCALAR_SCHEDULES
from mulan_tpu.models.unet import UNet


def sample_times(rng, n: int, antithetic: bool) -> jax.Array:
  """Uniform or antithetic (low-discrepancy) time sampling over the batch.

  Parity: model_vdm.py:135-140 — antithetic draws one u ~ U[0,1) and strides
  the batch: t_i = (u + i/n) mod 1.
  """
  if antithetic:
    t0 = jax.random.uniform(rng)
    return jnp.mod(t0 + jnp.arange(0.0, 1.0, step=1.0 / n), 1.0)
  return jax.random.uniform(rng, shape=(n,))


class VDM(nn.Module):
  config: ModelConfig
  # Tensor-parallel mesh for activation pinning (see parallel/mesh.py).
  tensor_mesh: Optional[Mesh] = None

  def setup(self):
    cfg = self.config
    self.encdec = encdec_lib.EncDec(cfg)
    self.score_model = UNet(cfg, per_pixel_gamma=False,
                            tensor_mesh=self.tensor_mesh)
    if cfg.gamma_type not in SCALAR_SCHEDULES:
      raise ValueError(f'unknown scalar gamma_type: {cfg.gamma_type!r}')
    self.gamma = SCALAR_SCHEDULES[cfg.gamma_type](cfg)

  # -- training ELBO -------------------------------------------------------

  def __call__(self, images, labels, conditioning, step,
               deterministic: bool = True):
    n = images.reshape(-1, *self.config.image_shape).shape[0]
    t = sample_times(self.make_rng('sample'), n,
                     self.config.antithetic_time_sampling)
    T = self.config.sm_n_timesteps
    if T > 0:
      t = jnp.ceil(t * T) / T
    return self.elbo(images, labels, conditioning, step, t, deterministic)

  def elbo(self, images, labels, conditioning, step, t,
           deterministic: bool = True):
    """ELBO at explicit diffusion times t (B,); see MuLAN.elbo."""
    del labels, step
    cfg = self.config
    x = images.reshape(-1, *cfg.image_shape)
    T = cfg.sm_n_timesteps

    g_0 = self.gamma(jnp.zeros((1,)))[0]
    g_1 = self.gamma(jnp.ones((1,)))[0]
    var_0, var_1 = nn.sigmoid(g_0), nn.sigmoid(g_1)

    f = self.encdec.encode(x)

    # 1. reconstruction: z_0 rescaled by 1/alpha_0 (model_vdm.py:121-126).
    eps_0 = jax.random.normal(self.make_rng('sample'), f.shape)
    z_0_rescaled = f + jnp.exp(0.5 * g_0) * eps_0
    loss_recon = -self.encdec.logprob(x, z_0_rescaled, g_0)

    # 2. prior KL at t=1 (model_vdm.py:129-131).
    mean1_sqr = (1.0 - var_1) * jnp.square(f)
    loss_klz = 0.5 * jnp.sum(mean1_sqr + var_1 - jnp.log(var_1) - 1.0,
                             axis=(1, 2, 3))

    # 3. diffusion loss.
    g_t, g_t_grad = self.gamma.gamma_and_dgamma(t)
    var_t = nn.sigmoid(g_t)[:, None, None, None]
    eps = jax.random.normal(self.make_rng('sample'), f.shape)
    z_t = jnp.sqrt(1.0 - var_t) * f + jnp.sqrt(var_t) * eps
    model_output = self.score_model(z_t, g_t, conditioning[:, None],
                                    deterministic)
    # NOTE: the reference computes the MSE against eps for BOTH
    # parameterizations (model_vdm.py:156-168) — under 'input' only the
    # discrete-time WEIGHTING changes to the x-MSE weight
    # SNR(s)-SNR(t) = exp(-g_t)*expm1(g_t-g_s); reproduced exactly.
    mse = jnp.sum(jnp.square(eps - model_output), axis=(1, 2, 3))
    if T == 0:
      loss_diff = 0.5 * g_t_grad * mse
    else:
      g_s = self.gamma(t - 1.0 / T)
      if cfg.reparam_type == 'input':
        loss_diff = 0.5 * T * jnp.exp(-g_t) * jnp.expm1(g_t - g_s) * mse
      else:
        loss_diff = 0.5 * T * jnp.expm1(g_t - g_s) * mse

    return ELBOOutput(loss_recon=loss_recon, loss_klz=loss_klz,
                      loss_diff=loss_diff, var_0=var_0, var_1=var_1)

  # -- ancestral sampling (model_vdm.py:182-210) ---------------------------

  def sample(self, i, T, z_t, conditioning, rng):
    rng_body = jax.random.fold_in(rng, i)
    eps = jax.random.normal(rng_body, z_t.shape)
    t = (T - i) / T
    s = (T - i - 1) / T

    g_s = self.gamma(jnp.full((1,), s, jnp.float32))[0]
    g_t = self.gamma(jnp.full((1,), t, jnp.float32))[0]
    model_output = self.score_model(
        z_t, g_t * jnp.ones((z_t.shape[0],)), conditioning[:, None],
        deterministic=True)
    eps_hat = self._to_eps_hat(model_output, z_t, g_t)
    a = nn.sigmoid(-g_s)
    b = nn.sigmoid(-g_t)
    c = -jnp.expm1(g_s - g_t)
    sigma_t = jnp.sqrt(nn.sigmoid(g_t))
    return (jnp.sqrt(a / b) * (z_t - sigma_t * c * eps_hat)
            + jnp.sqrt((1.0 - a) * c) * eps)

  def _to_eps_hat(self, model_output, z_t, g_t):
    """Interpret the score model output under `reparam_type`.

    'input': the model predicts x-hat; convert to eps-hat via
    eps = (z_t - alpha_t * x-hat) / sigma_t (model_vdm.py:197-201).
    Anything else: the model already predicts eps.
    """
    if self.config.reparam_type != 'input':
      return model_output
    var_t = jnp.asarray(nn.sigmoid(g_t))
    var_t = var_t.reshape(var_t.shape
                          + (1,) * (model_output.ndim - var_t.ndim))
    return (z_t - jnp.sqrt(1.0 - var_t) * model_output) / jnp.sqrt(var_t)

  def conditional_sample(self, i, T, z_t, embedding, conditioning, rng):
    """API-uniform with MuLAN; the scalar-gamma VDM has no latent, so the
    embedding is ignored (mirrors the reference's apply_encoder stub
    pattern, model_vdm.py:240-241)."""
    del embedding
    return self.sample(i, T, z_t, conditioning, rng)

  def generate_x(self, z_0):
    g_0 = self.gamma(jnp.zeros((1,)))[0]
    var_0 = nn.sigmoid(g_0)
    z_0_rescaled = z_0 / jnp.sqrt(1.0 - var_0)
    logits = self.encdec.decode_logits(z_0_rescaled, g_0)
    if self.config.sample_softmax:
      return jax.random.categorical(self.make_rng('sample'), logits)
    return jnp.argmax(logits, axis=-1)

  # -- SDE / probability-flow ODE (model_vdm.py:229-259) -------------------

  def sde(self, xt, t):
    t = t * jnp.ones((xt.shape[0],), xt.dtype)
    g_t, g_t_grad = self.gamma.gamma_and_dgamma(t)
    g_t = g_t[:, None, None, None]
    g_t_grad = g_t_grad[:, None, None, None]
    drift = -0.5 * nn.sigmoid(g_t) * g_t_grad * xt
    diffusion_sqr = nn.sigmoid(g_t) * g_t_grad
    return drift, diffusion_sqr

  def reverse_ode(self, xt, embeddings, t, high_precision: bool = False):
    del high_precision
    t = t * jnp.ones((xt.shape[0],), xt.dtype)
    drift, diffusion_sqr = self.sde(xt, t)
    g_t = self.gamma(t)
    model_output = self.score_model(xt, g_t, embeddings[:, :1],
                                    deterministic=True)
    # The reference's reverse_ode treats the output as eps-hat UNCONDITIONALLY
    # (model_vdm.py:243-259 has no reparam branch — under 'input' its PF-ODE
    # would integrate x-hat as if it were eps-hat). Here the 'input'
    # conversion is applied, a documented improvement mirroring the sampler.
    eps_hat = self._to_eps_hat(model_output, xt, g_t)
    score_hat = -eps_hat / jnp.sqrt(nn.sigmoid(g_t))[:, None, None, None]
    return drift - 0.5 * diffusion_sqr * score_hat

  def apply_encoder(self, images_int):
    """Stub for eval-harness API uniformity (model_vdm.py:240-241)."""
    return jnp.zeros((images_int.shape[0], self.config.latent_size),
                     jnp.float32)

  def apply_gamma(self, t, x_zero=None, step=0, deterministic: bool = False):
    del x_zero, step, deterministic
    t = jnp.atleast_1d(jnp.asarray(t, jnp.float32))
    return self.gamma(t)
