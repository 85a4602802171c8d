"""Capture + summarize an XProf trace of the flagship train super-step.

Usage (on the real TPU):
  python tools/profile_step.py [--substeps 10] [--logdir /tmp/prof]
      [--attention] [--ldm] [--stacked] [--fsdp N]

Runs one warmup super-step, traces the second, then parses the xplane proto
(via tensorflow's bundled protobuf) and prints per-op-category and top-op
tables — the measurement loop behind docs/PERF.md. No tensorboard needed.
"""

import argparse
import collections
import glob
import json
import os
import time


def capture(args) -> str:
  import jax
  from mulan_tpu.configs import cifar10_conditioned
  from mulan_tpu.train.loop import Experiment

  config = cifar10_conditioned.get_config()
  config.data.dataset = 'synthetic'
  config.data.synthetic_examples = 1024
  config.training.substeps = args.substeps
  config.training.batch_size_train = 128
  config.training.batch_size_eval = 128
  if args.attention:
    config.model.with_attention = True
  if args.ldm:
    config.model.unet_type = 'ldm'
  if args.stacked:
    config.optimizer.stacked = True
  if args.fsdp > 1:
    config.training.fsdp = args.fsdp

  exp = Experiment(config)
  state = exp._put_state(exp.state)
  batch = exp._put_superbatch(next(exp.train_iter))
  state, metrics = exp._p_superstep(state, batch)  # compile + warmup
  jax.block_until_ready(metrics)

  t0 = time.perf_counter()
  jax.profiler.start_trace(args.logdir)
  state, metrics = exp._p_superstep(state, exp._put_superbatch(
      next(exp.train_iter)))
  jax.block_until_ready(metrics)
  jax.profiler.stop_trace()
  dt = time.perf_counter() - t0
  print(json.dumps({'steps_per_sec': args.substeps / dt,
                    'superstep_sec': dt, 'substeps': args.substeps}))
  return args.logdir


def find_xplane(logdir: str) -> str:
  paths = sorted(glob.glob(os.path.join(
      logdir, 'plugins', 'profile', '*', '*.xplane.pb')))
  assert paths, f'no xplane under {logdir}'
  return paths[-1]


_CATEGORY_HINTS = (
    ('conv', 'convolution'),
    ('fusion', 'fusion'),
    ('copy', 'copy/transpose'),
    ('transpose', 'copy/transpose'),
    ('all-reduce', 'collective'),
    ('all-gather', 'collective'),
    ('reduce-scatter', 'collective'),
    ('collective', 'collective'),
    ('dot', 'dot'),
    ('custom-call', 'custom-call'),
    ('reduce', 'reduce'),
    ('scatter', 'scatter/gather'),
    ('gather', 'scatter/gather'),
    ('dynamic-update-slice', 'dus'),
    ('dynamic-slice', 'dus'),
    ('rng', 'rng'),
)


def summarize(xplane_path: str, top: int = 40):
  from tensorflow.core.profiler.protobuf import xplane_pb2
  xspace = xplane_pb2.XSpace()
  with open(xplane_path, 'rb') as f:
    xspace.ParseFromString(f.read())

  by_op = collections.Counter()
  by_cat = collections.Counter()
  total_ps = 0
  for plane in xspace.planes:
    if 'TPU' not in plane.name and 'device' not in plane.name.lower():
      continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
      if line.name != 'XLA Ops':
        continue
      for event in line.events:
        name = meta.get(event.metadata_id, '?')
        dur = event.duration_ps
        total_ps += dur
        by_op[name] += dur
        cat = 'other'
        lname = name.lower()
        for hint, category in _CATEGORY_HINTS:
          if lname.startswith(hint) or f'.{hint}' in lname:
            cat = category
            break
        by_cat[cat] += dur

  if total_ps == 0:
    print('no XLA Ops line found (is this a device trace?)')
    return
  ms = 1e-9
  print(f'\n== categories (total {total_ps * ms:.1f} ms summed op time) ==')
  for cat, ps in by_cat.most_common():
    print(f'  {cat:<18} {ps * ms:9.2f} ms  {100 * ps / total_ps:5.1f}%')
  print(f'\n== top {top} ops ==')
  for name, ps in by_op.most_common(top):
    print(f'  {ps * ms:9.2f} ms  {100 * ps / total_ps:5.1f}%  {name[:110]}')


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--substeps', type=int, default=10)
  parser.add_argument('--logdir', default='/tmp/mulan_prof')
  parser.add_argument('--attention', action='store_true')
  parser.add_argument('--ldm', action='store_true')
  parser.add_argument('--stacked', action='store_true')
  parser.add_argument('--fsdp', type=int, default=1)
  parser.add_argument('--parse_only', default='',
                      help='skip capture; parse this logdir')
  parser.add_argument('--top', type=int, default=40)
  args = parser.parse_args()

  logdir = args.parse_only or capture(args)
  summarize(find_xplane(logdir), top=args.top)


if __name__ == '__main__':
  main()
