"""Train/eval CLI.

Parity: /root/reference/ldm/main.py —
  python -m mulan_tpu.main --mode {train,eval} --config=<config.py> \
      --workdir=<dir> [--checkpoint=<ckpt dir>] [--config.foo=...]

TPU specifics: calls jax.distributed.initialize() when launched multi-process
(the reference relies on env-based init and never calls it, experiment.py has
no initialize), and pins fp32 matmul precision only when the model config
asks for fp32 compute.
"""

import os

os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')

from absl import app, flags, logging
import jax
from ml_collections import config_flags

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file('config', None, 'Training configuration.',
                                lock_config=False)
flags.DEFINE_string('workdir', None, 'Work unit directory.')
flags.DEFINE_string('checkpoint', '', 'Checkpoint to evaluate.')
flags.DEFINE_string('mode', 'train', 'train / eval')
flags.DEFINE_string('log_level', 'info', 'info/warning/error')
flags.DEFINE_bool('multiprocess', False,
                  'Call jax.distributed.initialize() (multi-host TPU).')
flags.DEFINE_bool('jax_debug_nans', False,
                  'Error on NaN production (debug config, SURVEY section 5).')
flags.DEFINE_bool('jax_disable_jit', False, 'Run op-by-op for debugging.')
flags.DEFINE_bool('nan_guard', False,
                  'Check every per-substep metric for NaN/inf after each '
                  'super-step and fail naming the first bad (substep, '
                  'scalar). Cheap; for op-level hunts use --jax_debug_nans.')
flags.DEFINE_string('compilation_cache_dir', '~/.cache/mulan_tpu_xla',
                    'Persistent XLA compilation cache ("" disables). '
                    'Restarted/requeued jobs skip the multi-minute UNet '
                    'compile.')
flags.mark_flags_as_required(['config', 'workdir'])


def main(argv):
  del argv
  if FLAGS.multiprocess:
    jax.distributed.initialize()
  if jax.process_index() == 0:
    logging.set_verbosity(FLAGS.log_level)
  else:
    logging.set_verbosity('error')
  logging.warning('=== Start of main() ===')
  logging.info('JAX process: %d / %d', jax.process_index(),
               jax.process_count())
  logging.info('JAX devices: %r', jax.devices())

  if FLAGS.compilation_cache_dir:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser(FLAGS.compilation_cache_dir))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)
  if FLAGS.jax_debug_nans:
    jax.config.update('jax_debug_nans', True)
  if FLAGS.nan_guard:
    FLAGS.config.training.nan_guard = True
  if FLAGS.jax_disable_jit:
    jax.config.update('jax_disable_jit', True)
  if FLAGS.config.model.get('compute_dtype', 'float32') == 'float32':
    # Reference pins fp32 matmuls (main.py:39); with bf16 compute the
    # ModelConfig dtype policy governs precision instead.
    jax.config.update('jax_default_matmul_precision', 'float32')

  from mulan_tpu.train.loop import Experiment
  from mulan_tpu.utils import get_workdir

  experiment = Experiment(FLAGS.config)

  if FLAGS.mode == 'train':
    workdir = os.path.join(FLAGS.workdir, get_workdir())
    logging.info('Training at workdir: %s', workdir)
    experiment.train_and_evaluate(workdir)
  elif FLAGS.mode == 'eval':
    experiment.evaluate(FLAGS.workdir, FLAGS.checkpoint)
  else:
    raise ValueError(f'unknown --mode: {FLAGS.mode!r}')


if __name__ == '__main__':
  app.run(main)
