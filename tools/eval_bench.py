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
  import argparse
  parser = argparse.ArgumentParser()
  parser.add_argument('--mode', default='base',
                      choices=['base', 'is20', 'rk4', 'sample', 'eval_block'],
                      help='base: dense + single-IS ode rows; '
                           'is20: serial-vs-batched IS at num_is=20 '
                           '(VERDICT r2 item 3 target: >=4x); '
                           'rk4: fixed-grid throughput + BPD drift vs '
                           'dopri5; sample: T=1000 ancestral sampler '
                           'images/sec (the serving path).')
  parser.add_argument('--batch_size', type=int, default=16)
  parser.add_argument('--solver', default='dopri5',
                      choices=['dopri5', 'rk4'],
                      help='solver for --mode=is20')
  parser.add_argument('--rk4_steps', type=int, default=32)
  args = parser.parse_args()

  config = cifar10_conditioned.get_config()
  config.data.dataset = 'synthetic'
  # The eval split is synthetic_examples // 4; keep it larger than any
  # max_batches window below or the difference method silently measures
  # fewer batches than requested (= pure dispatch jitter).
  config.data.synthetic_examples = 4096
  config.training.batch_size_eval = args.batch_size
  exp = Experiment(config)
  n_chips = len(jax.devices())

  # eval_bpd_* build a fresh jax.jit per CALL, so a separate warm-up call
  # keeps nothing warm. Time two calls with different batch counts and use
  # the DIFFERENCE: the per-call constant (trace + persistent-cache
  # compile/deserialize) cancels, leaving pure per-batch throughput.
  def timed(fn, n_batches):
    t0 = time.perf_counter()
    out = fn(n_batches)
    return time.perf_counter() - t0, out

  def throughput(fn, small=1, large=5):
    timed(fn, small)  # warm-up: pays the real XLA compile (persistent cache)
    dt_small, _ = timed(fn, small)
    dt_large, _ = timed(fn, large)
    imgs = (large - small) * config.training.batch_size_eval
    print(json.dumps({'metric': 'throughput_raw_dts',
                      'dt_small': round(dt_small, 2),
                      'dt_large': round(dt_large, 2),
                      'small': small, 'large': large}))
    return imgs / max(dt_large - dt_small, 1e-9) / n_chips

  # Batches actually available: the eval split is synthetic_examples // 4.
  avail_batches = (config.data.synthetic_examples // 4) // args.batch_size

  if args.mode == 'base':
    # Wide window: after the round-3 dispatch-pipelining fix the per-image
    # cost is small next to the tunnel's per-call constants (which the
    # difference cancels only down to their multi-second jitter). Clamp to
    # the batches the loader can actually yield or the rate is overstated.
    large = min(30, avail_batches)
    assert avail_batches > 2, (
        f'base mode needs >2 eval batches for the difference window '
        f'(large={large} vs small=2 would measure 0 images); split has '
        f'{avail_batches} at batch_size={args.batch_size} — raise '
        f'--synthetic_examples or lower --batch_size')
    dense = throughput(lambda n: evals.eval_bpd_dense(
        exp, config, n_timesteps=128, max_batches=n), small=2, large=large)
    print(json.dumps({'metric': 'dense_vlb_images_per_sec_per_chip',
                      'value': round(dense, 4), 'n_timesteps': 128}))

    # dopri5 cost varies per data batch (adaptive NFE) and the tunnel's
    # 50-250s per-call constants swamp difference measurements at this cost
    # (two documented failed attempts; see PERF.md) — report one warm large
    # call INCLUDING constants, like the round-3 PERF rows.
    def ode_run(n):
      return evals.eval_bpd_ode(exp, config, num_is=1, max_batches=n,
                                rtol=1e-5, atol=1e-5)
    timed(ode_run, 1)  # warm-up
    dt, _ = timed(ode_run, 5)
    ode = 5 * config.training.batch_size_eval / dt / n_chips
    print(json.dumps({'metric': 'ode_nll_images_per_sec_per_chip',
                      'value': round(ode, 4), 'rtol': 1e-5, 'num_is': 1,
                      'note': 'incl per-call constants'}))

  elif args.mode == 'is20':
    # Paper settings (num_is=20): serial IS loop (the reference
    # architecture, one solve per IS draw) vs IS samples tiled into shared
    # solves. Difference method (t(2 batches) - t(1 batch)) so the very
    # different trace+compile constants of the two programs cancel.
    assert avail_batches >= 6, (
        f'is20 needs 6 eval batches, split has {avail_batches} at '
        f'batch_size={args.batch_size}')
    n_img = config.training.batch_size_eval
    rows = {}
    for label, is_batch in (('batched', 0), ('serial', 1)):
      def run(n, ib=is_batch):
        return evals.eval_bpd_ode(exp, config, num_is=20, is_batch=ib,
                                  max_batches=n, rtol=1e-5, atol=1e-5,
                                  solver=args.solver,
                                  rk4_steps=args.rk4_steps)
      _, bpd = timed(run, 1)  # warm-up: pays the real XLA compile
      dt1, _ = timed(run, 1)  # constant = trace + cache deserialize only
      dt2, _ = timed(run, 6)
      print(json.dumps({'metric': f'is20_{label}_raw_dts',
                        'dt1': round(dt1, 2), 'dt6': round(dt2, 2)}))
      # 5-batch marginal window: the tunnel's per-call constant jitter is
      # tens of seconds, so a 1-batch marginal is unmeasurable once the
      # eval is dispatch-pipelined.
      rate = 5 * n_img / max(dt2 - dt1, 1e-9) / n_chips
      rows[label] = rate
      print(json.dumps({
          'metric': f'ode_is20_{label}_images_per_sec_per_chip',
          'value': round(rate, 4), 'bpd': round(float(bpd), 4),
          'num_is': 20, 'solver': args.solver}))
    print(json.dumps({'metric': 'ode_is20_batched_speedup',
                      'value': round(rows['batched'] / rows['serial'], 2)}))

  elif args.mode == 'rk4':
    # Fixed-grid RK4 throughput dial + recorded BPD drift vs dopri5 at the
    # paper tolerances on the SAME data (identical rng stream).
    dt_ref, bpd_ref = timed(lambda n: evals.eval_bpd_ode(
        exp, config, num_is=1, max_batches=n, rtol=1e-5, atol=1e-5), 2)
    for steps in (32, 64, 128):
      dt, bpd = timed(lambda n, s=steps: evals.eval_bpd_ode(
          exp, config, num_is=1, max_batches=n, solver='rk4',
          rk4_steps=s), 2)
      print(json.dumps({
          'metric': f'ode_rk4_{steps}_images_per_sec_per_chip',
          'value': round(2 * config.training.batch_size_eval / dt / n_chips,
                         4),
          'bpd_drift_vs_dopri5': round(float(bpd) - float(bpd_ref), 5),
          'nfe': 4 * steps}))
    print(json.dumps({'metric': 'ode_dopri5_ref_images_per_sec_per_chip',
                      'value': round(
                          2 * config.training.batch_size_eval / dt_ref
                          / n_chips, 4),
                      'bpd': round(float(bpd_ref), 4)}))

  elif args.mode == 'eval_block':
    # The in-training eval block at the steps_per_eval cadence
    # (loop.py _run_eval). Times the shipped dispatch-then-materialize
    # pattern against the old per-batch host sync (jax.tree.map(float)
    # after every _p_eval_step) it replaced — VERDICT r3 item 5's number.
    import jax.numpy as jnp
    n = config.training.num_steps_eval

    def run_synced(n_steps):
      out = []
      for idx in range(n_steps):
        batch = exp._put_batch(next(exp.eval_iter))
        scalars = exp._p_eval_step(exp.state.ema_params, batch,
                                   jnp.int32(idx))
        out.append(jax.tree.map(float, scalars))  # host sync per batch
      return out

    exp._run_eval(exp.state.ema_params, 2)  # warm-up: compiles _p_eval_step
    dt_sync, _ = timed(lambda _: run_synced(n), None)
    dt_desync, _ = timed(
        lambda _: exp._run_eval(exp.state.ema_params, n), None)
    print(json.dumps({
        'metric': 'train_eval_block_seconds',
        'num_steps_eval': n, 'batch_size_eval': args.batch_size,
        'desynced': round(dt_desync, 2), 'per_batch_sync': round(dt_sync, 2),
        'speedup': round(dt_sync / max(dt_desync, 1e-9), 2)}))

  elif args.mode == 'sample':
    # T=1000 ancestral sampling (the training-eval/serving grid path: a
    # fori_loop of UNet forwards, exp._p_sample). The jitted fn persists on
    # the Experiment, so calls after the first are pure device execution.
    b = args.batch_size
    rng = jax.random.PRNGKey(0)
    out = exp._p_sample(exp.state.ema_params, rng, b, 1000)  # compile
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(2):
      out = exp._p_sample(exp.state.ema_params,
                          jax.random.fold_in(rng, i), b, 1000)
      out.block_until_ready()
    rate = 2 * b / (time.perf_counter() - t0) / n_chips
    print(json.dumps({'metric': 'ancestral_T1000_images_per_sec_per_chip',
                      'value': round(rate, 4), 'batch': b}))


if __name__ == '__main__':
  main()
