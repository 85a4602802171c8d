"""Optimizer and learning-rate schedule factory.

Parity: /root/reference/ldm/experiment.py:106-182 —
  * linear warmup 0 -> lr over `num_steps_lr_warmup`, optional joined linear
    decay to 0 (`lr_decay`);
  * adamw with a weight-decay mask excluding biases (the reference mask also
    names '(final_)layer_norm.scale' paths, which never occur in its models,
    so effectively only biases are excluded — reproduced exactly here so that
    training dynamics match);
  * two parameter groups split on the top-level key: 'score_model' vs
    {'encoder_model', 'gamma'} via optax.masked. The reference reserves a
    `lr_gamma_network_scale` hook (configs/imagenet32.py:89) that it never
    wires up; here it actually scales the non-score group's learning rate
    (default 1.0 == reference behavior);
  * optional global-norm clipping when `gradient_clip_norm` is set.
"""

from __future__ import annotations

from typing import Any, Mapping, NamedTuple

import flax
import jax
import jax.flatten_util  # noqa: F401  (registers jax.flatten_util)
import jax.numpy as jnp
import optax

TOP_LEVEL_GROUPS = ('encoder_model', 'score_model', 'gamma')


def make_lr_schedule(learning_rate: float, num_steps_lr_warmup: int,
                     num_steps_train: int, lr_decay: bool):
  if num_steps_lr_warmup <= 0:
    warmup = optax.constant_schedule(learning_rate)
  else:
    warmup = optax.linear_schedule(0.0, learning_rate, num_steps_lr_warmup)
  if not lr_decay:
    return warmup
  decay = optax.linear_schedule(
      learning_rate, 0.0, num_steps_train - num_steps_lr_warmup)
  return optax.join_schedules([warmup, decay],
                              boundaries=[num_steps_lr_warmup])


def _decay_mask(params):
  flat = flax.traverse_util.flatten_dict(params)
  mask = {path: path[-1] != 'bias' for path in flat}
  return flax.traverse_util.unflatten_dict(mask)


def _group_mask(params, *, score: bool):
  flat = flax.traverse_util.flatten_dict(params)
  mask = {}
  for path in flat:
    assert path[0] in TOP_LEVEL_GROUPS, f'unexpected param group: {path[0]}'
    mask[path] = (path[0] == 'score_model') == score
  return flax.traverse_util.unflatten_dict(mask)


def make_optimizer(optimizer_config: Mapping[str, Any], lr_schedule,
                   gamma_lr_scale: float = 1.0
                   ) -> optax.GradientTransformation:
  """Two-group adamw over the {score_model} / {encoder_model, gamma} split.

  `optimizer.fused=True` selects an alternative implementation that runs the
  adam+decay update on ONE concatenated parameter vector with per-element
  decay/lr masks (validated equivalent in tests/test_fused_optimizer.py).
  Measured on v5e it is NOT faster for this model: the per-leaf optax
  fusions (741 of them, 43 ms of summed op time) overlap with the backward
  pass, while the flat version serializes behind a full-gradient concat
  (3.64 vs 3.98 steps/sec) — so the default stays False. Revisit if leaf
  count grows 10x.
  """
  cfg = dict(optimizer_config)
  if cfg.get('name', 'adamw') != 'adamw':
    raise ValueError(f"unknown optimizer: {cfg.get('name')!r}")
  args = dict(cfg.get('args', {}))
  clip_norm = cfg.get('gradient_clip_norm')

  if cfg.get('fused', False):
    return make_fused_adamw(args, lr_schedule, gamma_lr_scale, clip_norm)
  if cfg.get('stacked', False):
    tx = make_stacked_adamw(args, lr_schedule, gamma_lr_scale)
    if clip_norm is not None:
      tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx

  def adamw(schedule):
    return optax.adamw(learning_rate=schedule, mask=_decay_mask, **args)

  def scaled_schedule(step):
    return lr_schedule(step) * gamma_lr_scale

  tx = optax.chain(
      optax.masked(adamw(lr_schedule),
                   mask=lambda p: _group_mask(p, score=True)),
      optax.masked(adamw(scaled_schedule),
                   mask=lambda p: _group_mask(p, score=False)),
  )
  if clip_norm is not None:
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
  return tx


class FusedAdamState(NamedTuple):
  count: jax.Array  # int32 step counter
  mu: jax.Array     # (n_params,) first moment
  nu: jax.Array     # (n_params,) second moment


def _flat_masks(params, gamma_lr_scale: float):
  """Per-element (decay, lr-scale) vectors in ravel_pytree leaf order."""
  import numpy as np
  flat = flax.traverse_util.flatten_dict(
      flax.serialization.to_state_dict(params))
  decay_parts, scale_parts = [], []
  for path, leaf in sorted(flat.items()):
    size = int(np.prod(jnp.shape(leaf))) if jnp.shape(leaf) else 1
    decay_parts.append(
        np.full(size, 0.0 if path[-1] == 'bias' else 1.0, np.float32))
    scale = 1.0 if path[0] == 'score_model' else gamma_lr_scale
    scale_parts.append(np.full(size, scale, np.float32))
  return (jnp.concatenate([jnp.asarray(p) for p in decay_parts]),
          jnp.concatenate([jnp.asarray(p) for p in scale_parts]))


def make_fused_adamw(args: Mapping[str, Any], lr_schedule,
                     gamma_lr_scale: float = 1.0,
                     clip_norm=None) -> optax.GradientTransformation:
  """adamw on one flat parameter vector (optax.adamw semantics: scale_by_adam
  -> add_decayed_weights(mask=not-bias) -> scale by -lr, with the non-score
  group's lr scaled by gamma_lr_scale)."""
  b1 = args.get('b1', 0.9)
  b2 = args.get('b2', 0.999)
  eps = args.get('eps', 1e-8)
  wd = args.get('weight_decay', 1e-4)

  def init(params):
    flat, _ = jax.flatten_util.ravel_pytree(params)
    zeros = jnp.zeros_like(flat, jnp.float32)
    return FusedAdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                          nu=jnp.copy(zeros))

  def update(grads, state, params):
    assert params is not None
    g, _ = jax.flatten_util.ravel_pytree(grads)
    g = g.astype(jnp.float32)
    p, unravel = jax.flatten_util.ravel_pytree(params)
    decay_mask, lr_scale = _flat_masks(params, gamma_lr_scale)

    if clip_norm is not None:
      norm = jnp.sqrt(jnp.sum(g * g))
      g = g * jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-12))

    count = state.count + 1
    mu = b1 * state.mu + (1 - b1) * g
    nu = b2 * state.nu + (1 - b2) * g * g
    c = count.astype(jnp.float32)
    mu_hat = mu / (1 - b1 ** c)
    nu_hat = nu / (1 - b2 ** c)
    upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
    upd = upd + wd * decay_mask * p
    lr = lr_schedule(state.count)
    upd = (-lr * lr_scale) * upd
    return unravel(upd), FusedAdamState(count=count, mu=mu, nu=nu)

  return optax.GradientTransformation(init, update)


class StackedAdamState(NamedTuple):
  count: jax.Array
  mu: tuple  # per shape-group (n_leaves, *shape) float32 first moments
  nu: tuple  # second moments


def _shape_groups(params, gamma_lr_scale: float):
  """Deterministic grouping of leaves by (shape, dtype, decay, lr-scale).

  Decay/lr-scale are part of the key so every group is attribute-uniform
  (no per-leaf masks inside the stacked update)."""
  flat = flax.traverse_util.flatten_dict(
      flax.serialization.to_state_dict(params))
  groups: dict = {}
  for path in sorted(flat):
    leaf = flat[path]
    decay = path[-1] != 'bias'
    scale = 1.0 if path[0] == 'score_model' else gamma_lr_scale
    key = (tuple(jnp.shape(leaf)), jnp.result_type(leaf).name, decay, scale)
    groups.setdefault(key, []).append(path)
  return sorted(groups.items(), key=lambda kv: repr(kv[0]))


def make_stacked_adamw(args: Mapping[str, Any], lr_schedule,
                       gamma_lr_scale: float = 1.0
                       ) -> optax.GradientTransformation:
  """adamw over SHAPE-STACKED leaves (optax.adamw semantics).

  The default per-leaf optax chain emits one small update fusion per leaf —
  741 for the flagship UNet, ~20% of summed op time on v5e (docs/PERF.md).
  Here leaves of identical (shape, dtype, decay, lr-scale) are stacked into
  one (n, *shape) array (e.g. the ~60 (3,3,128,128) conv kernels become a
  single tensor), the adam+decay update runs once per group (~30 fusions
  total), and the per-leaf slices are handed back for apply_updates. The
  extra stack/unstack traffic is a few hundred MB/step — ~1 ms of HBM time
  against tens of ms of fusion overhead. Validated equivalent to the optax
  two-group chain in tests/test_fused_optimizer.py."""
  unknown = set(args) - {'b1', 'b2', 'eps', 'weight_decay'}
  if unknown:
    raise ValueError(
        f'stacked adamw does not implement optimizer args {sorted(unknown)};'
        ' use the default optax chain for those')
  b1 = args.get('b1', 0.9)
  b2 = args.get('b2', 0.999)
  eps = args.get('eps', 1e-8)
  wd = args.get('weight_decay', 1e-4)

  def init(params):
    groups = _shape_groups(params, gamma_lr_scale)
    mu = tuple(jnp.zeros((len(paths), *key[0]), jnp.float32)
               for key, paths in groups)
    nu = tuple(jnp.zeros((len(paths), *key[0]), jnp.float32)
               for key, paths in groups)
    return StackedAdamState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

  def update(grads, state, params):
    assert params is not None
    flat_g = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(grads))
    flat_p = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(params))
    groups = _shape_groups(params, gamma_lr_scale)
    count = state.count + 1
    c = count.astype(jnp.float32)
    lr = lr_schedule(state.count)
    new_mu, new_nu = [], []
    flat_u = {}
    for gi, ((_, _, decay, scale), paths) in enumerate(groups):
      g = jnp.stack([flat_g[p] for p in paths]).astype(jnp.float32)
      mu = b1 * state.mu[gi] + (1 - b1) * g
      nu = b2 * state.nu[gi] + (1 - b2) * jnp.square(g)
      mu_hat = mu / (1 - b1 ** c)
      nu_hat = nu / (1 - b2 ** c)
      upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
      if decay:
        p = jnp.stack([flat_p[q] for q in paths]).astype(jnp.float32)
        upd = upd + wd * p
      upd = (-lr * scale) * upd
      for i, path in enumerate(paths):
        flat_u[path] = upd[i].astype(jnp.result_type(flat_p[path]))
      new_mu.append(mu)
      new_nu.append(nu)
    updates = flax.serialization.from_state_dict(
        grads, flax.traverse_util.unflatten_dict(flat_u))
    return updates, StackedAdamState(count=count, mu=tuple(new_mu),
                                     nu=tuple(new_nu))

  return optax.GradientTransformation(init, update)


def global_norm(pytree) -> jax.Array:
  return optax.global_norm(pytree)
