"""Likelihood-eval throughput bench (dense VLB + exact-NLL ODE) on TPU.

Refreshes the PERF.md eval rows: images/sec/chip at the flagship CIFAR-10
architecture with the TPU execution policy, after kernel changes. Uses a
fresh (untrained) model like the round-1 measurement — ODE NFE depends on
the learned schedule stiffness, so only compare like-for-like.

  python tools/eval_bench.py
"""

import sys
_REPO = __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import json
import os
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

  # Dense VLB (n_timesteps=128): warm one batch, then time 4.
  evals.eval_bpd_dense(exp, config, n_timesteps=128, max_batches=1)
  t0 = time.perf_counter()
  n_batches = 4
  evals.eval_bpd_dense(exp, config, n_timesteps=128, max_batches=n_batches)
  dt = time.perf_counter() - t0
  imgs = n_batches * config.training.batch_size_eval
  print(json.dumps({'metric': 'dense_vlb_images_per_sec_per_chip',
                    'value': round(imgs / dt / n_chips, 4),
                    'n_timesteps': 128}))

  # Exact NLL ODE (rtol=atol=1e-5, 1 IS sample, batch 16).
  evals.eval_bpd_ode(exp, config, num_is=1, max_batches=1,
                     rtol=1e-5, atol=1e-5)
  t0 = time.perf_counter()
  evals.eval_bpd_ode(exp, config, num_is=1, max_batches=n_batches,
                     rtol=1e-5, atol=1e-5)
  dt = time.perf_counter() - t0
  print(json.dumps({'metric': 'ode_nll_images_per_sec_per_chip',
                    'value': round(imgs / dt / n_chips, 4),
                    'rtol': 1e-5, 'num_is': 1}))


if __name__ == '__main__':
  main()
