"""Baseline scalar-gamma VDM on CIFAR-10 (vdm_type='vdm').

The reference ships this model family (model_vdm.py) selectable via
`--config.vdm_type=vdm`; this config makes it a first-class target
(BASELINE.json config #1).
"""

from mulan_tpu.configs import cifar10_conditioned


def get_config():
  config = cifar10_conditioned.get_config()
  config.vdm_type = 'vdm'
  config.model.gamma_type = 'learnable_nnet'
  config.model.z_conditioning = False
  return config
