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

from typing import Any, Mapping

import flax
import jax
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
  """Two-group adamw over the {score_model} / {encoder_model, gamma} split."""
  cfg = dict(optimizer_config)
  if cfg.get('name', 'adamw') != 'adamw':
    raise ValueError(f"unknown optimizer: {cfg.get('name')!r}")
  args = dict(cfg.get('args', {}))

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
  clip_norm = cfg.get('gradient_clip_norm')
  if clip_norm is not None:
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
  return tx


def global_norm(pytree) -> jax.Array:
  return optax.global_norm(pytree)
