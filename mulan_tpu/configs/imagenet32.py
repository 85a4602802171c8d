"""ImageNet32 MuLAN-epsilon config.

Parity: /root/reference/ldm/configs/imagenet32.py.
"""


from mulan_tpu.configs import cifar10_conditioned


def get_config():
  config = cifar10_conditioned.get_config()
  config.data.dataset = 'imagenet32'
  config.vdm_type = 'mulan_epsilon'
  config.model.sm_n_embd = 256
  config.model.latent_k = 15
  config.training.num_steps_train = 2_000_000
  config.training.batch_size_train = 512
  config.training.batch_size_eval = 512
  config.lr_gamma_network_scale = 1.0
  return config
