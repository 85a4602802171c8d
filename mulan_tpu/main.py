"""Train/eval/sample CLI.

Parity: /root/reference/ldm/main.py —
  python -m mulan_tpu.main --mode {train,eval} --config=<config.py> \
      --workdir=<dir> [--checkpoint=<ckpt dir>] [--config.foo=...]

Beyond the reference: --mode sample draws unconditional samples from a
checkpoint (ancestral T-step or probability-flow ODE) and writes a PNG
grid, and --mode analyze writes the notebook-analysis artifacts (latent
clusters, schedule curves/heatmaps/histograms, PCA scatter) as PNGs — the
reference exposes both only through training-eval hooks and the notebook
(notebook_utils.py:56-124, :376-443, :534-753).

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
flags.DEFINE_string('mode', 'train', 'train / eval / sample / analyze')
flags.DEFINE_integer('analyze_batches', 8,
                     '--mode analyze: eval batches probed for logits.')
flags.DEFINE_float('analyze_min_cosine', 0.9,
                   '--mode analyze: latent-cluster cosine threshold '
                   '(k=15 latents: 0.9 requires ~14 of 15 shared).')
flags.DEFINE_integer('sample_batch', 16, '--mode sample: samples to draw.')
flags.DEFINE_integer('sample_T', 1000,
                     '--mode sample: ancestral steps (sampler=ancestral).')
flags.DEFINE_string('sampler', 'ancestral',
                    '--mode sample: ancestral / ode (probability-flow).')
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

  if FLAGS.mode == 'sample':
    _sample(FLAGS)
    return
  if FLAGS.mode == 'analyze':
    _analyze(FLAGS)
    return

  experiment = Experiment(FLAGS.config)

  if FLAGS.mode == 'train':
    workdir = os.path.join(FLAGS.workdir, get_workdir())
    logging.info('Training at workdir: %s', workdir)
    experiment.train_and_evaluate(workdir)
  elif FLAGS.mode == 'eval':
    experiment.evaluate(FLAGS.workdir, FLAGS.checkpoint)
  else:
    raise ValueError(f'unknown --mode: {FLAGS.mode!r}')


def _sample(FLAGS):
  """Draw a sample grid from a checkpoint's EMA weights."""
  import numpy as np
  import PIL.Image

  from mulan_tpu.evals.harness import EvalExperiment
  from mulan_tpu.utils.metrics import image_grid

  if not FLAGS.checkpoint:
    raise ValueError('--mode sample needs --checkpoint=<checkpoints dir>')
  g = int(np.sqrt(FLAGS.sample_batch))
  if g * g != FLAGS.sample_batch:
    raise ValueError(f'--sample_batch must be a perfect square (grid '
                     f'layout), got {FLAGS.sample_batch}')
  exp = EvalExperiment(FLAGS.config, FLAGS.checkpoint)
  logging.info('sampling from checkpoint step %d', exp.checkpoint_step)
  if FLAGS.sampler == 'ancestral':
    samples = exp.random_samples(batch_size=FLAGS.sample_batch,
                                 T=FLAGS.sample_T)
  elif FLAGS.sampler == 'ode':
    from mulan_tpu.evals.nll_ode import make_ode_sample_fn
    sample_fn = make_ode_sample_fn(exp.model, exp.model_config)
    z0, nfe = sample_fn(exp.params, exp._sample_rng, FLAGS.sample_batch)
    logging.info('ode sampler nfe: %d', int(nfe))
    samples = np.asarray(exp.model.apply(
        {'params': exp.params}, z0, method=exp.model.generate_x),
        np.uint8)
  else:
    raise ValueError(f'unknown --sampler: {FLAGS.sampler!r}')
  if jax.process_index() == 0:
    os.makedirs(FLAGS.workdir, exist_ok=True)
    path = os.path.join(
        FLAGS.workdir,
        f'samples_ckpt{exp.checkpoint_step}_{FLAGS.sampler}.png')
    PIL.Image.fromarray(image_grid(samples)).save(path)
    print(f'Wrote {len(samples)} samples: {path}')


def _analyze(FLAGS):
  """Write the reference-notebook analysis artifacts as PNGs from a
  checkpoint: latent-cluster image gallery, per-cluster noise-schedule
  curves, per-pixel gamma heatmap/histograms, and a PCA embedding scatter
  (the reference exposes these only interactively,
  notebook_utils.py:534-753; mulan_tpu/analysis.py holds the primitives)."""
  import matplotlib
  matplotlib.use('Agg')
  import numpy as np

  from mulan_tpu import analysis
  from mulan_tpu.evals.harness import EvalExperiment
  from mulan_tpu.models import latents

  if not FLAGS.checkpoint:
    raise ValueError('--mode analyze needs --checkpoint=<checkpoints dir>')
  exp = EvalExperiment(FLAGS.config, FLAGS.checkpoint)
  cfg = exp.model_config
  if not hasattr(exp.model, 'gamma_of'):
    raise ValueError('--mode analyze probes the learned per-pixel schedule; '
                     f'vdm_type={FLAGS.config.vdm_type!r} has a scalar '
                     'schedule (use TensorBoard scalars instead).')
  logging.info('analyzing checkpoint step %d', exp.checkpoint_step)

  logits, images = analysis.get_logits(exp, num_batches=FLAGS.analyze_batches)
  embeddings = latents.logits_to_embeddings(logits, cfg.latent_k)
  emb_np, images = np.asarray(embeddings), np.asarray(images)
  clusters = analysis.cluster_embeddings(
      emb_np, min_cosine=FLAGS.analyze_min_cosine)
  logging.info('%d images -> %d latent clusters (min_cosine=%.2f)',
               len(emb_np), clusters.n_clusters, FLAGS.analyze_min_cosine)

  # Schedule curves for up to 6 distinct latents (cluster leaders when the
  # clustering found structure, else the first few examples).
  if clusters.n_clusters:
    probe_idx = np.asarray(clusters.leaders[:6])
    labels = [f'cluster {i}' for i in range(len(probe_idx))]
  else:
    probe_idx = np.arange(min(4, len(emb_np)))
    labels = [f'example {i}' for i in probe_idx]
  grids = [np.asarray(g) for g in analysis.noise_schedule_per_embedding(
      exp, embeddings[probe_idx])]

  figs = {
      'cluster_gallery': analysis.cluster_gallery(images, clusters),
      'schedule_curves': analysis.schedule_curves(grids, labels=labels),
      'schedule_heatmap': analysis.schedule_heatmap(grids[0],
                                                    cfg.image_shape),
      'schedule_histograms': analysis.schedule_histograms(grids[0]),
      'embedding_pca': analysis.embedding_scatter(
          analysis.pca_transformation(emb_np, 2),
          # assignment == -1 (unclustered) renders grey, not cluster 0
          colors=clusters.assignment if clusters.n_clusters else None),
  }
  if jax.process_index() == 0:
    os.makedirs(FLAGS.workdir, exist_ok=True)
    for name, fig in figs.items():
      path = os.path.join(
          FLAGS.workdir, f'{name}_ckpt{exp.checkpoint_step}.png')
      fig.savefig(path, dpi=150, bbox_inches='tight')
      print(f'Wrote {path}')


if __name__ == '__main__':
  app.run(main)
