"""Capture + summarize an XProf trace of the flagship train super-step.

Usage (on the real TPU):
  python tools/profile_step.py [--substeps 10] [--logdir /tmp/prof]
      [--attention] [--ldm] [--stacked] [--fsdp N] [--tp N]

Runs one warmup super-step, traces the second, then parses the xplane proto
(via tensorflow's bundled protobuf) and prints per-op-category and top-op
tables — the measurement loop behind docs/PERF.md. No tensorboard needed.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)


import argparse
import collections
import glob
import json
import time


def capture(args) -> str:
  import jax
  jax.config.update('jax_compilation_cache_dir',
                    os.path.expanduser('~/.cache/mulan_tpu_xla'))
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
  from mulan_tpu.configs import cifar10_conditioned
  from mulan_tpu.train.loop import Experiment

  if args.imagenet32:
    from mulan_tpu.configs import imagenet32
    config = imagenet32.get_config()
    batch = 64 * len(jax.devices())  # matches bench.py --imagenet32
  else:
    config = cifar10_conditioned.get_config()
    batch = 128
  config.data.dataset = 'synthetic'
  config.data.synthetic_examples = 1024
  config.training.substeps = args.substeps
  config.training.batch_size_train = batch
  config.training.batch_size_eval = batch
  if args.attention:
    config.model.with_attention = True
    # 66 attention blocks' flash residuals exceed HBM at batch 128 without
    # rematerialization; 'attn' is the measured-best policy (docs/PERF.md).
    config.model.remat = args.remat or 'attn'
  elif args.remat:
    config.model.remat = args.remat
  if args.ldm:
    config.model.unet_type = 'ldm'
  if args.stacked:
    config.optimizer.stacked = True
  if args.gamma_high:
    config.model.gamma_precision = 'high'
  if args.mask_batch:
    config.model.dropout_mask_batch = True
  if args.fused_gn:
    config.model.fused_gn_swish = True
  if args.fsdp > 1:
    config.training.fsdp = args.fsdp
  if args.tp > 1:
    config.training.tp = args.tp

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


PEAK_BF16_FLOPS = 197e12  # v5e MXU peak
PEAK_HBM_BPS = 819e9


def summarize(xplane_path: str, top: int = 40):
  """Aggregate by the profiler's own hlo_category + per-op flops/bytes
  stats; prints achieved TFLOP/s / GB/s per bucket so compute-bound vs
  bandwidth-bound buckets are obvious."""
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  xspace = xplane_pb2.XSpace()
  with open(xplane_path, 'rb') as f:
    xspace.ParseFromString(f.read())

  op_time = collections.Counter()
  op_meta = {}
  cat_time = collections.Counter()
  cat_flops = collections.Counter()
  cat_bytes = collections.Counter()
  total_ps = 0
  for plane in xspace.planes:
    if 'TPU' not in plane.name and 'device' not in plane.name.lower():
      continue
    stat_names = {s.id: s.name for s in plane.stat_metadata.values()}
    metas = {}
    for m in plane.event_metadata.values():
      stats = {}
      for st in m.stats:
        sname = stat_names.get(st.metadata_id)
        if sname == 'hlo_category':
          stats['cat'] = st.str_value
        elif sname == 'flops':
          stats['flops'] = st.int64_value
        elif sname == 'bytes_accessed':
          stats['bytes'] = st.int64_value
        elif sname == 'tf_op':
          stats['tf_op'] = st.str_value
      metas[m.id] = (m.name.lstrip('%').split(' ')[0], stats)
    for line in plane.lines:
      if line.name != 'XLA Ops':
        continue
      for event in line.events:
        name, stats = metas.get(event.metadata_id, ('?', {}))
        lname = name.lower()
        # Control-flow wrappers (the scan while-loop) span their children;
        # counting them would double every nested op.
        if lname.startswith(('while', 'body', 'condition', 'call')):
          continue
        dur = event.duration_ps
        total_ps += dur
        op_time[name] += dur
        op_meta.setdefault(name, stats)
        cat = stats.get('cat', 'other')
        cat_time[cat] += dur
        cat_flops[cat] += stats.get('flops', 0)
        cat_bytes[cat] += stats.get('bytes', 0)

  if total_ps == 0:
    print('no XLA Ops line found (is this a device trace?)')
    return
  sec = 1e-12
  total_s = total_ps * sec
  total_flops = sum(cat_flops.values())
  print(f'\n== categories (total {total_s * 1e3:.1f} ms summed op time; '
        f'aggregate {total_flops / total_s / 1e12:.1f} TFLOP/s = '
        f'{100 * total_flops / total_s / PEAK_BF16_FLOPS:.1f}% of bf16 peak '
        f'over busy time) ==')
  print(f'  {"category":<26} {"ms":>9} {"share":>6} {"TFLOP/s":>8} '
        f'{"%MXU":>6} {"GB/s":>7} {"%HBM":>6}')
  for cat, ps in cat_time.most_common():
    t = ps * sec
    fl = cat_flops[cat] / t / 1e12
    bw = cat_bytes[cat] / t / 1e9
    print(f'  {cat:<26} {t * 1e3:9.2f} {100 * ps / total_ps:5.1f}% '
          f'{fl:8.1f} {100 * fl * 1e12 / PEAK_BF16_FLOPS:5.1f}% '
          f'{bw:7.1f} {100 * bw * 1e9 / PEAK_HBM_BPS:5.1f}%')
  print(f'\n== top {top} ops ==')
  for name, ps in op_time.most_common(top):
    stats = op_meta.get(name, {})
    t = ps * sec
    tf_op = stats.get('tf_op', '')[-60:]
    print(f'  {t * 1e3:9.2f} ms {100 * ps / total_ps:5.1f}% '
          f'{cat_or(stats):<22} {name[:40]:<42} {tf_op}')


def cat_or(stats):
  return stats.get('cat', 'other')


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--substeps', type=int, default=10)
  parser.add_argument('--logdir', default='/tmp/mulan_prof')
  parser.add_argument('--attention', action='store_true')
  parser.add_argument('--remat', default='',
                      choices=['', 'none', 'all', 'attn', 'alt'])
  parser.add_argument('--ldm', action='store_true')
  parser.add_argument('--stacked', action='store_true')
  parser.add_argument('--imagenet32', action='store_true')
  parser.add_argument('--gamma_high', action='store_true')
  parser.add_argument('--mask_batch', action='store_true')
  parser.add_argument('--fused_gn', action='store_true')
  parser.add_argument('--fsdp', type=int, default=1)
  parser.add_argument('--tp', type=int, default=1)
  parser.add_argument('--parse_only', default='',
                      help='skip capture; parse this logdir')
  parser.add_argument('--top', type=int, default=40)
  args = parser.parse_args()

  logdir = args.parse_only or capture(args)
  summarize(find_xplane(logdir), top=args.top)


if __name__ == '__main__':
  main()
