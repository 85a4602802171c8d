"""Train state with EMA parameters.

Parity: /root/reference/ldm/train_state.py — {step, params, ema_params,
opt_state} with EMA update `ema += (1 - rate) * (new - ema)`. Unlike the
reference, the optimizer is built ONCE with the learning-rate schedule baked
in (optax tracks the step internally), instead of rebuilding the optax chain
at the current lr on every step (train_state.py:85-88) — identical math for
adam-family optimizers, one less traced closure in the scanned step.
"""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
  step: jax.Array
  params: Any
  ema_params: Any
  opt_state: optax.OptState
  tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
  apply_fn: Callable = flax.struct.field(pytree_node=False)

  def apply_gradients(self, *, grads, ema_rate):
    updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
    new_params = optax.apply_updates(self.params, updates)
    new_ema = jax.tree.map(lambda e, p: e + (1.0 - ema_rate) * (p - e),
                           self.ema_params, new_params)
    return self.replace(step=self.step + 1, params=new_params,
                        ema_params=new_ema, opt_state=new_opt_state)

  @classmethod
  def create(cls, *, apply_fn, params, tx):
    import jax.numpy as jnp
    # EMA starts as a deep COPY: params and ema_params must not alias, or
    # buffer donation of the state would donate the same buffer twice.
    ema = jax.tree.map(jnp.copy, params)
    return cls(step=jnp.zeros((), jnp.int32), params=params,
               ema_params=ema, opt_state=tx.init(params), tx=tx,
               apply_fn=apply_fn)


def merge_restored(state_dict: dict, restored: dict) -> dict:
  """Recursively copy into `state_dict` only the keys present in `restored`.

  Partial warm-start semantics of the reference's `copy_dict`
  (/root/reference/ldm/experiment.py:377-392): a checkpoint saved from a
  smaller/different model restores the intersection and leaves fresh values
  elsewhere.
  """
  if not isinstance(state_dict, dict):
    return restored
  out = dict(state_dict)
  for key, value in state_dict.items():
    if isinstance(restored, dict) and key in restored:
      out[key] = merge_restored(value, restored[key])
  return out
