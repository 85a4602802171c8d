"""Likelihood-eval throughput bench (dense VLB + exact-NLL ODE) on TPU.

Refreshes the PERF.md eval rows: images/sec/chip at the flagship CIFAR-10
architecture with the TPU execution policy, after kernel changes. Uses a
fresh (untrained) model like the round-1 measurement — ODE NFE depends on
the learned schedule stiffness, so only compare like-for-like.

  python tools/eval_bench.py
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import json
import time

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/mulan_tpu_xla'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)

from mulan_tpu import evals
from mulan_tpu.configs import cifar10_conditioned
from mulan_tpu.train.loop import Experiment


def main():
  config = cifar10_conditioned.get_config()
  config.data.dataset = 'synthetic'
  config.data.synthetic_examples = 512
  config.training.batch_size_eval = 16
  exp = Experiment(config)
  n_chips = len(jax.devices())

  # eval_bpd_* build a fresh jax.jit per CALL, so a separate warm-up call
  # keeps nothing warm. Time two calls with different batch counts and use
  # the DIFFERENCE: the per-call constant (trace + persistent-cache
  # compile/deserialize) cancels, leaving pure per-batch throughput.
  def timed(fn, n_batches):
    t0 = time.perf_counter()
    fn(n_batches)
    return time.perf_counter() - t0

  def throughput(fn, small=1, large=5):
    dt_small = timed(fn, small)
    dt_large = timed(fn, large)
    imgs = (large - small) * config.training.batch_size_eval
    return imgs / max(dt_large - dt_small, 1e-9) / n_chips

  dense = throughput(lambda n: evals.eval_bpd_dense(
      exp, config, n_timesteps=128, max_batches=n))
  print(json.dumps({'metric': 'dense_vlb_images_per_sec_per_chip',
                    'value': round(dense, 4), 'n_timesteps': 128}))

  ode = throughput(lambda n: evals.eval_bpd_ode(
      exp, config, num_is=1, max_batches=n, rtol=1e-5, atol=1e-5))
  print(json.dumps({'metric': 'ode_nll_images_per_sec_per_chip',
                    'value': round(ode, 4), 'rtol': 1e-5, 'num_is': 1}))


if __name__ == '__main__':
  main()
