"""Model zoo: baseline VDM and MuLAN (epsilon / velocity)."""

import functools

from mulan_tpu.models.config import ModelConfig, model_config_from_dict
from mulan_tpu.models.mulan import MuLAN
from mulan_tpu.models.outputs import ELBOOutput
from mulan_tpu.models.vdm import VDM


def build_model(vdm_type: str, config: ModelConfig, tensor_mesh=None):
  """Registry matching the reference `vdm_types`
  (/root/reference/ldm/experiment_vdm.py:32-36).

  tensor_mesh: optional jax Mesh with a 'tensor' axis; when given, UNet block
  activations pin their channel axis to it (parallel/mesh.py)."""
  registry = {
      'vdm': VDM,
      'mulan_epsilon': functools.partial(MuLAN, parameterization='epsilon'),
      'mulan_velocity': functools.partial(MuLAN, parameterization='velocity'),
  }
  if vdm_type not in registry:
    raise ValueError(f'unknown vdm_type: {vdm_type!r}')
  return registry[vdm_type](config, tensor_mesh=tensor_mesh)


__all__ = ['ModelConfig', 'model_config_from_dict', 'MuLAN', 'VDM',
           'ELBOOutput', 'build_model']
