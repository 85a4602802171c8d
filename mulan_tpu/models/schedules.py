"""Noise-schedule networks gamma(t) and gamma(z_x, t).

Scalar schedules (for the baseline VDM) mirror reference
/root/reference/ldm/model_vdm.py:416-509; the per-pixel MuLAN schedules mirror
/root/reference/ldm/model_mulan_epsilon.py:481-680.

TPU-first design decisions:
  * every schedule exposes `gamma_and_dgamma(...)` returning (gamma, dgamma/dt)
    in ONE pass. The polynomial schedule has a closed-form derivative
    (reference `_grad_t`, model_mulan_epsilon.py:540-555) so the training loss
    never needs `jax.jvp` through the schedule network — the coefficient MLP
    runs once instead of twice. Schedules without a closed form fall back to
    `jax.jvp` with a zero tangent on the embedding, exactly matching the
    reference's tangent structure (model_mulan_epsilon.py:339-343).
  * all schedule math is float32 regardless of the model compute dtype:
    gamma spans [-13.3, 5] and sigma^2 = sigmoid(gamma) spans e^-13.3, far
    below bf16 resolution.
  * everything takes t of shape (B,) and returns (B, n_out); no scalar
    special-casing inside traced code.

Note on the reference's `grad_min_epsilon` asymmetry (it appears in
`_eval_polynomial` but not `_grad_t`, model_mulan_epsilon.py:521,527 vs
:540-555): its value is 0.0 in the reference setup, making the two consistent;
we drop the dead constant entirely.
"""

from __future__ import annotations

import functools

from flax import linen as nn
import jax
import jax.numpy as jnp

from mulan_tpu.models.config import ModelConfig
from mulan_tpu.models.layers import DenseMonotone, constant_init


# --------------------------------------------------------------------------
# Scalar schedules (baseline VDM): gamma: (B,) -> (B,)
# --------------------------------------------------------------------------


class ScalarSchedule(nn.Module):
  """Base: default gamma_and_dgamma via forward-mode AD in t."""

  def gamma_and_dgamma(self, t):
    return jax.jvp(self.__call__, (t,), (jnp.ones_like(t),))


class NoiseScheduleScalar(ScalarSchedule):
  """gamma(t) = b + |w| t. Parity: model_vdm.py:418-431."""

  config: ModelConfig

  @nn.compact
  def __call__(self, t):
    gmin, gmax = self.config.gamma_min, self.config.gamma_max
    w = self.param('w', constant_init(gmax - gmin), (1,))
    b = self.param('b', constant_init(gmin), (1,))
    return b[0] + jnp.abs(w[0]) * t

  def gamma_and_dgamma(self, t):
    g = self(t)
    w = self.get_variable('params', 'w')
    return g, jnp.abs(w[0]) * jnp.ones_like(t)


class NoiseScheduleFixedLinear(ScalarSchedule):
  """gamma(t) = gmin + (gmax - gmin) t. Parity: model_vdm.py:462-468."""

  config: ModelConfig

  @nn.compact
  def __call__(self, t):
    c = self.config
    return c.gamma_min + (c.gamma_max - c.gamma_min) * t

  def gamma_and_dgamma(self, t):
    c = self.config
    return self(t), (c.gamma_max - c.gamma_min) * jnp.ones_like(t)


class NoiseScheduleNNet(ScalarSchedule):
  """Monotone MLP schedule: linear term + bounded nonlinear correction.

  Parity: model_vdm.py:471-509 (1 -> n_features -> 1 DenseMonotone stack with
  `2*(sigmoid(.) - .5)` squashing).
  """

  config: ModelConfig
  n_features: int = 1024

  def setup(self):
    c = self.config
    # Same fp32-gamma guarantee as the MuLAN schedules: pin the MXU pass
    # count regardless of compute_dtype (config.gamma_precision).
    prec = c.gamma_matmul_precision
    self.l1 = DenseMonotone(1, kernel_init=constant_init(c.gamma_max -
                                                         c.gamma_min),
                            bias_init=constant_init(c.gamma_min),
                            precision=prec)
    self.l2 = DenseMonotone(self.n_features,
                            kernel_init=nn.initializers.normal(),
                            precision=prec)
    self.l3 = DenseMonotone(1, kernel_init=nn.initializers.normal(),
                            use_bias=False, precision=prec)

  def __call__(self, t):
    t = t.reshape(-1, 1)
    h = self.l1(t)
    _h = 2.0 * (t - 0.5)
    _h = self.l2(_h)
    _h = 2 * (nn.sigmoid(_h) - 0.5)
    _h = self.l3(_h) / self.n_features
    return jnp.squeeze(h + _h, axis=-1)


class NoiseScheduleBDM(ScalarSchedule):
  """Sigmoid-shaped fixed schedules (reference model_vdm.py:438-459 BadBDM /
  GoodBDM — present in the reference zoo though unused by shipped configs)."""

  config: ModelConfig
  good: bool = False

  @nn.compact
  def __call__(self, t):
    c = self.config
    if self.good:
      g = 2 - 2 * nn.sigmoid(10.0 * (1 - t))
    else:
      g = 2 * nn.sigmoid(t) - 1
    return c.gamma_min + (c.gamma_max - c.gamma_min) * g


class BlurScheduleScalar(ScalarSchedule):
  """sigma(t) = sigmoid(b + |w| t) (reference model_vdm.py:513-524)."""

  config: ModelConfig

  @nn.compact
  def __call__(self, t):
    w = self.param('w', constant_init(1.0), (1,))
    b = self.param('b', constant_init(0.0), (1,))
    return nn.sigmoid(b[0] + jnp.abs(w[0]) * t)


class BlurScheduleFixedLinear(ScalarSchedule):
  """sigma(t) = sigma_min + (sigma_max - sigma_min) t
  (model_vdm.py:527-533)."""

  config: ModelConfig

  @nn.compact
  def __call__(self, t):
    c = self.config
    return c.sigma_min + (c.sigma_max - c.sigma_min) * t


SCALAR_SCHEDULES = {
    'learnable_scalar': NoiseScheduleScalar,
    'fixed': NoiseScheduleFixedLinear,
    'learnable_nnet': NoiseScheduleNNet,
    'bad_bdm': NoiseScheduleBDM,
    'good_bdm': functools.partial(NoiseScheduleBDM, good=True),
}

BLUR_SCHEDULES = {
    'learnable_scalar': BlurScheduleScalar,
    'fixed': BlurScheduleFixedLinear,
}


# --------------------------------------------------------------------------
# MuLAN per-pixel schedules: gamma: (B, latent), (B,) -> (B, n_pixels)
# --------------------------------------------------------------------------


class MulanSchedule(nn.Module):
  """Base for per-pixel schedules conditioned on a latent embedding."""

  def gamma_and_dgamma(self, embedding, t):
    """Default: jvp with zero tangent on the embedding (reference tangent
    structure, model_mulan_epsilon.py:339-343)."""
    return jax.jvp(lambda tt: self(embedding, tt), (t,), (jnp.ones_like(t),))

  def elbo_gammas(self, embedding, t):
    """(gamma_0, gamma_1, gamma_t, dgamma_t/dt), each (B, n_pixels).

    Default: three schedule evaluations. Schedules with pinned endpoints
    and/or shared per-embedding context override this to evaluate their
    conditioning network once.
    """
    g_0 = self(embedding, jnp.zeros_like(t))
    g_1 = self(embedding, jnp.ones_like(t))
    g_t, dg_t = self.gamma_and_dgamma(embedding, t)
    return g_0, g_1, g_t, dg_t


class NoiseSchedulePolynomialFixedend(MulanSchedule):
  """THE MuLAN schedule (`gamma_type='poly_fixedend'`).

  gamma(z, t) = gmin + (gmax - gmin) * P(t) / P(1) where
  P(t) = integral_0^t (a u^2 + b u + c)^2 du, with per-pixel coefficients
  (a, b, c) produced by an MLP on the latent embedding. Monotone in t by
  construction (integrand is a square, c > 0) and pinned to gamma_min /
  gamma_max at t = 0 / 1. Parity: model_mulan_epsilon.py:481-613.

  `gamma_and_dgamma` uses the closed-form derivative
  dgamma/dt = (gmax - gmin) (a t^2 + b t + c)^2 / P(1)
  (reference `_grad_t`), sharing one coefficient-MLP evaluation.
  """

  config: ModelConfig
  n_features: int = -1  # -1 => n_pixels
  n_inverse_timesteps: int = 1000

  def setup(self):
    n_out = self.config.n_pixels
    width = self.n_features if self.n_features > 0 else n_out
    # MXU pass count for the f32 coefficient matmuls (config.gamma_precision;
    # storage/accumulation stays float32 at every setting).
    prec = self.config.gamma_matmul_precision
    self.l1 = nn.Dense(width, name='dense_1', precision=prec)
    self.l2 = nn.Dense(width, name='dense_2', precision=prec)
    self.l3_a = nn.Dense(n_out, name='dense_out_a',
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, precision=prec)
    self.l3_b = nn.Dense(n_out, name='dense_out_b', precision=prec)
    self.l3_c = nn.Dense(n_out, name='dense_out_c', precision=prec)

  def _coefficients(self, embedding):
    h = nn.swish(self.l1(embedding.astype(jnp.float32)))
    h = nn.swish(self.l2(h))
    a = self.l3_a(h)
    b = self.l3_b(h)
    c = 1e-3 + nn.softplus(self.l3_c(h))
    return a, b, c

  @staticmethod
  def _integral(a, b, c, t):
    """P(t) = integral of (a u^2 + b u + c)^2 from 0 to t (quintic)."""
    return ((a * a) * (t ** 5) / 5.0
            + (b * b + 2 * a * c) * (t ** 3) / 3.0
            + a * b * (t ** 4) / 2.0
            + b * c * (t ** 2)
            + (c * c) * t)

  @staticmethod
  def _scale(a, b, c):
    """P(1)."""
    return ((a * a) / 5.0 + (b * b + 2 * a * c) / 3.0 + a * b / 2.0
            + b * c + c * c)

  def __call__(self, embedding, t):
    a, b, c = self._coefficients(embedding)
    t = t.reshape(-1, 1).astype(jnp.float32)
    cfg = self.config
    poly = self._integral(a, b, c, t)
    return cfg.gamma_min + (cfg.gamma_max - cfg.gamma_min) * (
        poly / self._scale(a, b, c))

  def gamma_and_dgamma(self, embedding, t):
    a, b, c = self._coefficients(embedding)
    t = t.reshape(-1, 1).astype(jnp.float32)
    cfg = self.config
    span = cfg.gamma_max - cfg.gamma_min
    inv_scale = 1.0 / self._scale(a, b, c)
    gamma = cfg.gamma_min + span * self._integral(a, b, c, t) * inv_scale
    quad = a * t * t + b * t + c
    dgamma = span * (quad * quad) * inv_scale
    return gamma, dgamma

  def elbo_gammas(self, embedding, t):
    """One coefficient-MLP pass for all three ELBO gamma evaluations.

    The polynomial schedule is pinned by construction: P(0) = 0 so
    gamma(z, 0) == gamma_min, and P(1)/P(1) == 1 so gamma(z, 1) == gamma_max,
    identically in the parameters (zero gradient through either endpoint).
    The reference recomputes the full MLP for t=0 and t=1
    (model_mulan_epsilon.py:307-308); here the endpoints are constants and
    the MLP runs once.
    """
    a, b, c = self._coefficients(embedding)
    t = t.reshape(-1, 1).astype(jnp.float32)
    cfg = self.config
    span = cfg.gamma_max - cfg.gamma_min
    shape = (embedding.shape[0], cfg.n_pixels)
    g_0 = jnp.full(shape, cfg.gamma_min, jnp.float32)
    g_1 = jnp.full(shape, cfg.gamma_max, jnp.float32)
    inv_scale = 1.0 / self._scale(a, b, c)
    g_t = cfg.gamma_min + span * self._integral(a, b, c, t) * inv_scale
    quad = a * t * t + b * t + c
    dg_t = span * (quad * quad) * inv_scale
    return g_0, g_1, g_t, dg_t

  def inverse_sampling(self, embedding, targets):
    """Arc-length reparameterization of t (reference
    model_mulan_epsilon.py:557-600): find t' such that the cumulative curve
    length of gamma(., t) reaches `targets` fraction of the total."""
    assert embedding.ndim == 2 and targets.ndim == 1
    n = self.n_inverse_timesteps
    a, b, c = self._coefficients(embedding)
    grid = jnp.linspace(0.0, 1.0, num=n)[None, None, :]
    cfg = self.config
    span = cfg.gamma_max - cfg.gamma_min
    quad = (a[:, :, None] * grid * grid + b[:, :, None] * grid + c[:, :, None])
    dgamma = span * quad * quad / self._scale(a, b, c)[:, :, None]
    dl_dt = jnp.linalg.norm(dgamma, ord=2, axis=1)          # (B, n)
    dl_dt = 0.5 * (dl_dt[:, :-1] + dl_dt[:, 1:])
    cum = jnp.cumsum(dl_dt, axis=1) / (n - 1)
    cum = jnp.pad(cum, ((0, 0), (1, 0)))
    idx = jnp.argmin(
        jnp.square(cum - cum[:, -1:] * targets[:, None]), axis=1)
    new_t = idx.astype(jnp.float32) / (n - 1)
    return new_t, cum[:, -1]


class MulanScheduleNNet(MulanSchedule):
  """Monotone MLP over concat(embedding, t) (`gamma_type='learnable_nnet'`).

  Parity: model_mulan_epsilon.py:616-662. Monotone in t AND in the embedding
  (DenseMonotone everywhere); endpoints not pinned.
  """

  config: ModelConfig
  n_features: int = -1

  def setup(self):
    c = self.config
    n_out = c.n_pixels
    width = self.n_features if self.n_features > 0 else n_out
    kernel_init = nn.initializers.normal()
    prec = c.gamma_matmul_precision
    self.l1 = DenseMonotone(
        1, kernel_init=constant_init(c.gamma_max - c.gamma_min),
        bias_init=constant_init(c.gamma_min), precision=prec)
    self.l2 = DenseMonotone(width, kernel_init=kernel_init, precision=prec)
    self.l_int = DenseMonotone(width, kernel_init=kernel_init,
                               precision=prec)
    self.l3 = DenseMonotone(n_out, kernel_init=kernel_init, use_bias=False,
                            precision=prec)

  def __call__(self, embedding, t):
    t = t.reshape(-1, 1).astype(jnp.float32)
    assert t.shape[0] == embedding.shape[0]
    linear = self.l1(t)
    h = jnp.concatenate([embedding.astype(jnp.float32), t], axis=1)
    _h = 2.0 * (h - 0.5)
    _h = self.l2(_h)
    _h = 2 * (nn.sigmoid(_h) - 0.5)
    _h = self.l_int(_h)
    _h = 2 * (nn.sigmoid(_h) - 0.5)
    width = self.n_features if self.n_features > 0 else self.config.n_pixels
    _h = self.l3(_h) / width
    return linear + _h


class MulanScheduleLinear(MulanSchedule):
  """Per-pixel broadcast of the fixed linear schedule (`gamma_type='linear'`).

  Parity: model_mulan_epsilon.py:665-673.
  """

  config: ModelConfig

  @nn.compact
  def __call__(self, embedding, t):
    c = self.config
    g = c.gamma_min + (c.gamma_max - c.gamma_min) * t.reshape(-1, 1)
    return g * jnp.ones((embedding.shape[0], c.n_pixels), jnp.float32)

  def gamma_and_dgamma(self, embedding, t):
    c = self.config
    ones = jnp.ones((embedding.shape[0], c.n_pixels), jnp.float32)
    return self(embedding, t), (c.gamma_max - c.gamma_min) * ones


MULAN_SCHEDULES = {
    'linear': MulanScheduleLinear,
    'learnable_nnet': MulanScheduleNNet,
    'poly_fixedend': NoiseSchedulePolynomialFixedend,
}
