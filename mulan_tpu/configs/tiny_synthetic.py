"""Tiny synthetic-data config for CI / smoke tests: runs a full
train-eval-sample-checkpoint cycle on CPU in seconds."""

from mulan_tpu.configs import cifar10_conditioned


def get_config():
  config = cifar10_conditioned.get_config()
  config.data.dataset = 'synthetic'
  config.data.synthetic_examples = 256
  config.model.image_size = 8
  config.model.sm_n_embd = 16
  config.model.sm_n_layer = 2
  config.model.forward_n_layer = 1
  config.model.latent_size = 10
  config.model.latent_k = 3
  config.model.compute_dtype = 'float32'
  config.model.use_pallas = False
  config.training.substeps = 2
  config.training.num_steps_train = 4
  config.training.num_steps_eval = 2
  config.training.batch_size_train = 8
  config.training.batch_size_eval = 8
  config.training.steps_per_logging = 2
  config.training.steps_per_eval = 4
  config.training.steps_per_save = 4
  return config
