"""MuLAN: VDM with a learned per-pixel adaptive noise schedule.

One module covers both reference models:
  * `parameterization='epsilon'` — /root/reference/ldm/model_mulan_epsilon.py
  * `parameterization='velocity'` — /root/reference/ldm/model_mulan_velocity.py
    (including `velocity_from_epsilon`, which reinterprets an epsilon-trained
    network as a velocity predictor, model_mulan_velocity.py:246-249).

The two reference files are ~85% duplicated code; the only differences are
the diffusion-loss branch and the v->eps conversion in sampling/ODE, which is
what `parameterization` switches here.

ELBO structure (reference model_mulan_epsilon.py:280-363):
  x -> encode -> [-1,1];  encoder -> latent logits -> straight-through top-k
  (or gumbel / gaussian) embedding z_x + latent KL;  gamma(z_x, .) gives
  per-pixel gamma_0/gamma_1/gamma_t and dgamma_t/dt (one fused schedule pass
  here, see schedules.elbo_gammas);  reconstruction, prior-KL and diffusion
  terms as in VDM but with per-pixel gamma.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mulan_tpu.models import encdec as encdec_lib
from mulan_tpu.models import latents
from mulan_tpu.models.config import ModelConfig
from mulan_tpu.models.encoder import ENCODERS, UnetEncoderGaussian
from mulan_tpu.models.outputs import ELBOOutput
from mulan_tpu.models.schedules import MULAN_SCHEDULES
from mulan_tpu.models.unet import UNet
from mulan_tpu.models.vdm import sample_times


class MuLAN(nn.Module):
  config: ModelConfig
  parameterization: str = 'epsilon'  # 'epsilon' | 'velocity'
  # Tensor-parallel mesh for activation pinning (see parallel/mesh.py);
  # None (every builder outside Experiment) keeps the model mesh-agnostic.
  tensor_mesh: Optional[Mesh] = None

  def setup(self):
    cfg = self.config
    assert self.parameterization in ('epsilon', 'velocity')
    self.encdec = encdec_lib.EncDec(cfg)
    self.score_model = UNet(cfg, per_pixel_gamma=(cfg.unet_type == 'ldm'),
                            tensor_mesh=self.tensor_mesh)
    if cfg.latent_type in ('gumbel', 'topk'):
      self.encoder_model = ENCODERS[cfg.encoder](cfg)
    elif cfg.latent_type == 'gaussian':
      self.encoder_model = UnetEncoderGaussian(cfg)
    else:
      raise ValueError(f'unknown latent_type: {cfg.latent_type!r}')
    self.gamma = MULAN_SCHEDULES[cfg.gamma_type](cfg)

  # -- latent inference -----------------------------------------------------

  def apply_encoder(self, images_int):
    """uint8 images -> latent logits (public eval hook,
    model_mulan_epsilon.py:178-180)."""
    return self.encoder_model(self.encdec.encode(images_int),
                              deterministic=True)

  def _embedding_and_kl(self, orig_f, step, deterministic,
                        encoder_logits=None):
    cfg = self.config
    if encoder_logits is not None:
      assert cfg.latent_type in ('topk', 'gumbel'), cfg.latent_type
      logits_or_heads = encoder_logits
    else:
      logits_or_heads = self.encoder_model(orig_f, deterministic)
    if cfg.latent_type == 'topk':
      return latents.topk_embedding(self.make_rng('sample'), logits_or_heads,
                                    k=cfg.latent_k,
                                    noise_type=cfg.topk_noise_type)
    if cfg.latent_type == 'gumbel':
      emb = latents.gumbel_embedding(self.make_rng('sample'),
                                     logits_or_heads, step)
      return emb, latents.gumbel_kl(logits_or_heads, cfg.latent_size)
    # gaussian
    mu, var = logits_or_heads
    return latents.gaussian_embedding(self.make_rng('sample'), mu, var)

  # -- gamma plumbing --------------------------------------------------------

  def gamma_of(self, embedding, t):
    """gamma(z_x, t): (B, latent), (B,) -> (B, n_pixels)."""
    return self.gamma(embedding, t)

  def gamma_and_dgamma(self, embedding, t):
    return self.gamma.gamma_and_dgamma(embedding, t)

  def apply_gamma(self, t, x_zero=None, step=0,
                  deterministic: bool = False):
    """Public eval hook (model_mulan_epsilon.py:182-193)."""
    t = jnp.atleast_1d(jnp.asarray(t, jnp.float32))
    if x_zero is None:
      embedding = jnp.zeros((t.shape[0], self.config.latent_size))
    else:
      f = self.encdec.encode(x_zero)
      embedding, _ = self._embedding_and_kl(f, step, deterministic)
    return self.gamma(embedding, t)

  def _score_gt(self, g_t):
    """Adapter from the per-pixel gamma map to the score model's expected
    conditioning (model_mulan_epsilon.py:273-278): scalar mean for the
    'vdm' UNet, full map for 'ldm'."""
    assert g_t.ndim == 4
    if self.config.unet_type == 'vdm':
      return jnp.mean(g_t, axis=(1, 2, 3))
    return g_t

  def _conditioning(self, conditioning, embedding):
    if self.config.z_conditioning:
      return embedding
    return conditioning[:, None].astype(jnp.float32)

  def _to_eps_hat(self, model_out, g_t, z_t):
    """Model output -> epsilon prediction (for sampling)."""
    if self.parameterization == 'epsilon':
      return model_out
    v_hat = model_out
    if self.config.velocity_from_epsilon:
      # The network itself predicts epsilon; reinterpret as velocity first
      # (model_mulan_velocity.py:246-249), then convert back below.
      v_hat = (-jnp.exp(0.5 * g_t) * z_t
               + jnp.sqrt(1 + jnp.exp(g_t)) * v_hat)
    sigma_t = jnp.sqrt(nn.sigmoid(g_t))
    alpha_t = jnp.sqrt(nn.sigmoid(-g_t))
    return v_hat * alpha_t + sigma_t * z_t

  # -- training ELBO ---------------------------------------------------------

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
           deterministic: bool = True, encoder_logits=None):
    """ELBO at EXPLICIT diffusion times t (B,).

    `__call__` samples t and delegates here; the dense-VLB evaluator calls
    this directly with a stratified t-grid (the reference reaches the same
    effect implicitly by tiling one image n_timesteps times and relying on
    antithetic sampling, notebook_utils.py:176-191 — that trick breaks for
    multi-image batches, so the grid is explicit here).

    `encoder_logits`, if given, skips the encoder UNet: the latent logits
    are t-independent, so the dense sweep computes them ONCE per image and
    tiles them over the grid (the reference recomputes the encoder for
    every grid copy, notebook_utils.py:183-185). The per-copy latent
    SAMPLING (top-k/gumbel noise) still happens here, preserving the
    estimator's distribution exactly.
    """
    cfg = self.config
    x = images.reshape(-1, *cfg.image_shape)
    T = cfg.sm_n_timesteps

    orig_f = self.encdec.encode(x)
    if cfg.reparam_type == 'true':
      embedding, kl_z = self._embedding_and_kl(orig_f, step, deterministic,
                                               encoder_logits)
    else:
      embedding = jax.nn.one_hot(labels, 10)
      kl_z = 0.0

    g_0, g_1, g_t, g_t_grad = self.gamma.elbo_gammas(embedding, t)
    img = orig_f.shape
    g_0, g_1 = g_0.reshape(img), g_1.reshape(img)
    g_t, g_t_grad = g_t.reshape(img), g_t_grad.reshape(img)

    var_t = nn.sigmoid(g_t)
    var_0 = nn.sigmoid(g_0)
    var_1 = nn.sigmoid(g_1)

    # 1. reconstruction.
    eps_0 = jax.random.normal(self.make_rng('sample'), img)
    z_0_rescaled = orig_f + jnp.exp(0.5 * g_0) * eps_0
    loss_recon = -self.encdec.logprob(x, z_0_rescaled, g_0)

    # 2. prior KL at t=1 (per-pixel gamma_1).
    mean1_sqr = (1.0 - var_1) * jnp.square(orig_f)
    loss_klz = 0.5 * jnp.sum(mean1_sqr + var_1 - jnp.log(var_1) - 1.0,
                             axis=(1, 2, 3))

    # 3. diffusion loss.
    eps = jax.random.normal(self.make_rng('sample'), img)
    z_t = jnp.sqrt(1.0 - var_t) * orig_f + jnp.sqrt(var_t) * eps
    cond = self._conditioning(conditioning, embedding)
    model_out = self.score_model(z_t, self._score_gt(g_t), cond,
                                 deterministic)

    if self.parameterization == 'epsilon':
      if T == 0:
        loss_diff = 0.5 * jnp.sum(
            g_t_grad * jnp.square(eps - model_out), axis=(1, 2, 3))
      else:
        g_s = self.gamma(embedding, t - 1.0 / T).reshape(img)
        loss_diff = 0.5 * T * jnp.sum(
            jnp.expm1(g_t - g_s) * jnp.square(eps - model_out),
            axis=(1, 2, 3))
    else:
      assert T == 0, 'velocity parameterization is continuous-time only'
      v_hat = model_out
      if cfg.velocity_from_epsilon:
        v_hat = (-jnp.exp(0.5 * g_t) * z_t
                 + jnp.sqrt(1 + jnp.exp(g_t)) * v_hat)
      v_target = jnp.sqrt(1.0 - var_t) * eps - jnp.sqrt(var_t) * orig_f
      loss_diff = 0.5 * jnp.sum(
          (1 - var_t) * g_t_grad * jnp.square(v_target - v_hat),
          axis=(1, 2, 3))

    return ELBOOutput(loss_recon=loss_recon, loss_klz=kl_z + loss_klz,
                      loss_diff=loss_diff, var_0=jnp.mean(var_0),
                      var_1=jnp.mean(var_1))

  # -- ancestral sampling ----------------------------------------------------

  def deterministic_embedding(self, batch_size: int):
    cfg = self.config
    return latents.deterministic_embedding(batch_size, cfg.latent_size,
                                           cfg.latent_k, cfg.latent_type)

  def conditional_sample(self, i, T, z_t, embedding, conditioning, rng):
    """One ancestral step T -> 0 given a fixed latent embedding.

    Parity: model_mulan_epsilon.py:377-406 / model_mulan_velocity.py:281-313.
    """
    rng_body = jax.random.fold_in(rng, i)
    eps = jax.random.normal(rng_body, z_t.shape)
    bsz = z_t.shape[0]
    t = (T - i) / T * jnp.ones((bsz,), z_t.dtype)
    s = (T - i - 1) / T * jnp.ones((bsz,), z_t.dtype)

    g_t = self.gamma(embedding, t).reshape(z_t.shape)
    g_s = self.gamma(embedding, s).reshape(z_t.shape)
    cond = self._conditioning(conditioning, embedding)
    model_out = self.score_model(z_t, self._score_gt(g_t), cond,
                                 deterministic=True)
    eps_hat = self._to_eps_hat(model_out, g_t, z_t)

    a = nn.sigmoid(-g_s)
    b = nn.sigmoid(-g_t)
    c = -jnp.expm1(g_s - g_t)
    sigma_t = jnp.sqrt(nn.sigmoid(g_t))
    z_s_mean = jnp.sqrt(a / b) * (z_t - sigma_t * c * eps_hat)
    return z_s_mean + jnp.sqrt((1.0 - a) * c) * eps

  def sample(self, i, T, z_t, conditioning, rng):
    """Unconditional ancestral step (canonical deterministic embedding)."""
    embedding = self.deterministic_embedding(z_t.shape[0])
    return self.conditional_sample(i, T, z_t, embedding, conditioning, rng)

  def generate_x(self, z_0):
    g_0 = self.gamma(
        self.deterministic_embedding(z_0.shape[0]),
        jnp.zeros((z_0.shape[0],))).reshape(z_0.shape)
    var_0 = nn.sigmoid(g_0)
    z_0_rescaled = z_0 / jnp.sqrt(1.0 - var_0)
    logits = self.encdec.decode_logits(z_0_rescaled, g_0)
    if self.config.sample_softmax:
      return jax.random.categorical(self.make_rng('sample'), logits)
    return jnp.argmax(logits, axis=-1)

  # -- SDE / probability-flow ODE ---------------------------------------------

  def sde(self, xt, embeddings, t):
    t = t * jnp.ones((xt.shape[0],), xt.dtype)
    g_t, g_t_grad = self.gamma.gamma_and_dgamma(embeddings, t)
    g_t = g_t.reshape(xt.shape)
    g_t_grad = g_t_grad.reshape(xt.shape)
    drift = -0.5 * nn.sigmoid(g_t) * g_t_grad * xt
    diffusion = jnp.sqrt(nn.sigmoid(g_t) * g_t_grad)
    return drift, diffusion

  def score_fn(self, xt, gt, embeddings):
    """score(x_t) = -x_t - exp(-gamma/2) v_hat (velocity form,
    model_mulan_velocity.py:384-390)."""
    model_out = self.score_model(xt, self._score_gt(gt), embeddings,
                                 deterministic=True)
    if self.parameterization == 'epsilon':
      return -model_out / jnp.sqrt(nn.sigmoid(gt))
    v_hat = model_out
    if self.config.velocity_from_epsilon:
      return -v_hat * jnp.sqrt(1 + jnp.exp(-gt))
    return -xt - jnp.exp(-0.5 * gt) * v_hat

  def score_jvp(self, z_t, g_t, conditioning, v, deterministic: bool = True):
    """JVP of the score function w.r.t. the input (trace-matching hook,
    reference model_mulan_velocity.py:172-185)."""
    def score(xt, gt, emb):
      model_out = self.score_model(xt, self._score_gt(gt), emb,
                                   deterministic=deterministic)
      if self.parameterization == 'epsilon':
        return -model_out / jnp.sqrt(nn.sigmoid(gt))
      if self.config.velocity_from_epsilon:
        return -model_out * jnp.sqrt(1 + jnp.exp(-gt))
      return -xt - jnp.exp(-0.5 * gt) * model_out

    return jax.jvp(score, (z_t, g_t, conditioning),
                   (v, jnp.zeros_like(g_t), jnp.zeros_like(conditioning)))

  def reverse_ode(self, xt, embeddings, t, high_precision: bool = False):
    """Probability-flow drift dx/dt.

    epsilon form (model_mulan_epsilon.py:459-478):
        0.5 * (-sigma x + eps_hat) * sigma * dgamma/dt
    velocity form (model_mulan_velocity.py:393-421):
        0.5 * alpha * sigma * dgamma/dt * v_hat
    `high_precision` switches to log-domain sqrt(sigmoid) when sigma^2 or
    alpha^2 underflows (reference guards at model_mulan_velocity.py:410-416).
    """
    t = t * jnp.ones((xt.shape[0],), jnp.float32)
    g_t, g_t_grad = self.gamma.gamma_and_dgamma(embeddings, t)
    g_t = g_t.reshape(xt.shape)
    g_t_grad = g_t_grad.reshape(xt.shape)
    model_out = self.score_model(xt, self._score_gt(g_t), embeddings,
                                 deterministic=True)

    if high_precision:
      sigma = jnp.where(nn.sigmoid(g_t) <= 1e-3, jnp.exp(g_t / 2),
                        jnp.sqrt(nn.sigmoid(g_t)))
      alpha = jnp.where(1 - nn.sigmoid(g_t) <= 1e-3, jnp.exp(-g_t / 2),
                        jnp.sqrt(1 - nn.sigmoid(g_t)))
    else:
      sigma = jnp.sqrt(nn.sigmoid(g_t))
      alpha = jnp.sqrt(1 - nn.sigmoid(g_t))

    if self.parameterization == 'epsilon':
      return 0.5 * (-sigma * xt + model_out) * sigma * g_t_grad
    v_hat = model_out
    if self.config.velocity_from_epsilon:
      v_hat = (-jnp.exp(0.5 * g_t) * xt
               + jnp.sqrt(1 + jnp.exp(g_t)) * v_hat)
    return v_hat * 0.5 * alpha * sigma * g_t_grad
