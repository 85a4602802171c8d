"""BPD evaluation CLI.

Parity: /root/reference/ldm/eval_bpd.py —
  python -m mulan_tpu.eval_bpd --config=<config.py> \
      --checkpoint_directory=<ckpt dir> [--checkpoint=N] \
      --bpd_eval_method={sparse,dense,ode} [--n_timesteps=128] [--n_is=20]
      [--num_iters=1] [--hutchinson_type=Rademacher] [--rtol/--atol=1e-5]

All three estimators run on-device over the full mesh; dense and ode are
multi-chip/multi-host (the reference's dense path is single-GPU and its ode
path host-loops scipy — BASELINE.md capability deltas).
"""

import os

os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')

from absl import app, flags, logging
import jax
from ml_collections import config_flags

FLAGS = flags.FLAGS
config_flags.DEFINE_config_file('config', None, 'Training configuration.',
                                lock_config=False)
flags.DEFINE_string('checkpoint_directory', None, 'Checkpoint directory.')
flags.DEFINE_integer('checkpoint', None, 'Checkpoint step to evaluate '
                     '(default: latest).')
flags.DEFINE_string('bpd_eval_method', 'ode',
                    'sparse / dense / ode BPD estimator.')
flags.DEFINE_string('log_level', 'info', 'info/warning/error')
flags.DEFINE_integer('n_timesteps', 128,
                     'timestep-grid size for dense sampling.')
flags.DEFINE_integer('n_is', 20, 'Number of importance samples.')
flags.DEFINE_integer('num_iters', 1, 'Number of passes over the test set.')
flags.DEFINE_bool('deterministic_noise', False,
                  'Fix the Hutchinson draw per solve (the reference '
                  'redraws per RHS eval unless set). Under --solver=dopri5 '
                  'the draw is ALWAYS fixed within a solve regardless (a '
                  'stochastic RHS reads as stiffness to the adaptive '
                  'controller) and fresh per importance sample; under '
                  '--solver=rk4 (fixed grid) the reference default '
                  'applies: redraw per RHS time unless this flag is set.')
flags.DEFINE_enum('redraw_noise', 'auto', ['auto', 'true', 'false'],
                  'Per-RHS Hutchinson probe redraw. auto = solver default '
                  '(dopri5: fixed within a solve; rk4: redraw unless '
                  '--deterministic_noise). true with --solver=dopri5 '
                  'reproduces the reference\'s default estimator variant '
                  '(fresh probe per RHS call under an adaptive controller, '
                  'notebook_utils.py:233-261) — expect a higher NFE for the '
                  'same tolerances.')
flags.DEFINE_string('hutchinson_type', 'Rademacher',
                    'Hutchinson noise type: Rademacher/Gaussian.')
flags.DEFINE_string('dequantization', 'tn', 'tn / uniform dequantization.')
flags.DEFINE_float('rtol', 1e-5, 'rtol for the ODE solver.')
flags.DEFINE_float('atol', 1e-5, 'atol for the ODE solver.')
flags.DEFINE_float('first_step', 0.01, 'Initial ODE solver step size.')
flags.DEFINE_integer('max_steps', 5000,
                     'ODE solver step budget per solve; an unconverged '
                     'solve raises (or is excluded with '
                     '--on_solver_failure=warn).')
flags.DEFINE_string('on_solver_failure', 'raise',
                    'raise / warn when an ODE solve hits max_steps.')
flags.DEFINE_string('solver', 'dopri5',
                    'ODE solver: dopri5 (adaptive, exact within rtol/atol) '
                    'or rk4 (fixed grid — NFE is a throughput dial).')
flags.DEFINE_integer('rk4_steps', 128,
                     'Fixed-grid steps for --solver=rk4 (NFE = 4*steps).')
flags.DEFINE_integer('is_batch', 0,
                     'Importance samples batched into ONE ODE solve '
                     '(tiled along the sharded batch axis). 0 = auto '
                     '(~128 rows/chip); 1 = the reference serial IS loop.')
flags.DEFINE_integer('images_per_chunk', 0,
                     '--bpd_eval_method=dense: per-host images per compiled '
                     'call. 0 = auto (512 (image,t) rows per chip); lower it '
                     'if the forward-only chunk outgrows HBM on small chips.')
flags.DEFINE_bool('multiprocess', False,
                  'Call jax.distributed.initialize() (multi-host TPU).')
flags.mark_flags_as_required(['config', 'checkpoint_directory'])


def main(argv):
  del argv
  if FLAGS.multiprocess:
    jax.distributed.initialize()
  if jax.process_index() == 0:
    logging.set_verbosity(FLAGS.log_level)
  else:
    logging.set_verbosity('error')
  logging.warning('=== Start of eval_bpd main() ===')
  logging.info('JAX devices: %r', jax.devices())
  logging.info('method=%s rtol=%s atol=%s', FLAGS.bpd_eval_method,
               FLAGS.rtol, FLAGS.atol)

  from mulan_tpu import evals
  from mulan_tpu.evals.harness import EvalExperiment

  experiment = EvalExperiment(FLAGS.config, FLAGS.checkpoint_directory,
                              FLAGS.checkpoint)
  logging.info('evaluating checkpoint step %d', experiment.checkpoint_step)

  if FLAGS.bpd_eval_method == 'sparse':
    bpd = evals.eval_bpd_sparse(experiment, FLAGS.config)
  elif FLAGS.bpd_eval_method == 'dense':
    bpd = evals.eval_bpd_dense(experiment, FLAGS.config,
                               n_timesteps=FLAGS.n_timesteps,
                               images_per_chunk=FLAGS.images_per_chunk or
                               None)
  elif FLAGS.bpd_eval_method == 'ode':
    bpd = evals.eval_bpd_ode(
        experiment, FLAGS.config,
        hutchinson_type=FLAGS.hutchinson_type,
        dequantization=FLAGS.dequantization,
        deterministic_noise=FLAGS.deterministic_noise,
        num_iters=FLAGS.num_iters, num_is=FLAGS.n_is,
        rtol=FLAGS.rtol, atol=FLAGS.atol,
        first_step=FLAGS.first_step, max_steps=FLAGS.max_steps,
        on_solver_failure=FLAGS.on_solver_failure,
        solver=FLAGS.solver, rk4_steps=FLAGS.rk4_steps,
        is_batch=FLAGS.is_batch,
        redraw_noise={'auto': None, 'true': True,
                      'false': False}[FLAGS.redraw_noise])
  else:
    raise ValueError(f'unknown --bpd_eval_method: {FLAGS.bpd_eval_method!r}')

  print(f'Test BPD:{bpd} ckpt:{experiment.checkpoint_step}')


if __name__ == '__main__':
  app.run(main)
