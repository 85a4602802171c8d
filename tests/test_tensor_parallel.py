"""Tensor-parallel ('tensor' mesh axis) tests on the 8-device CPU mesh.

The reference has no tensor parallelism (pmap DP only, experiment.py:89-102);
this is a beyond-reference scaling axis: column-parallel output features via
NamedSharding, collectives inserted by GSPMD. Semantics must be IDENTICAL to
pure DP — these tests pin that, plus the sharding policy itself.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mulan_tpu.configs import tiny_synthetic
from mulan_tpu.parallel import mesh as mesh_lib
from mulan_tpu.train.loop import Experiment


def test_tp_mesh_shape():
  mesh = mesh_lib.create_mesh(fsdp=2, tp=2)
  assert mesh.axis_names == ('data', 'fsdp', 'tensor')
  assert (mesh.shape['data'], mesh.shape['fsdp'],
          mesh.shape['tensor']) == (2, 2, 2)
  # tp-only mesh (no fsdp axis)
  mesh = mesh_lib.create_mesh(tp=4)
  assert mesh.axis_names == ('data', 'tensor')
  assert mesh.shape['data'] == 2 and mesh.shape['tensor'] == 4


def test_param_sharding_column_parallel():
  mesh = mesh_lib.create_mesh(fsdp=2, tp=2)
  # conv kernel (H, W, Cin, Cout): Cout -> tensor, Cin (largest left) -> fsdp
  s = mesh_lib.param_sharding(mesh, (3, 3, 16, 32))
  assert s.spec == P(None, None, 'fsdp', 'tensor')
  # bias (Cout,): tensor only, fsdp replicated
  s = mesh_lib.param_sharding(mesh, (32,))
  assert s.spec == P('tensor')
  # odd trailing dim: tensor skipped, fsdp takes the divisible axis
  s = mesh_lib.param_sharding(mesh, (16, 5))
  assert s.spec == P('fsdp', None)
  # nothing divisible -> replicated
  assert mesh_lib.param_sharding(mesh, (3, 5)).spec == P()
  assert mesh_lib.param_sharding(mesh, ()).spec == P()


def test_batch_replicated_over_tensor():
  mesh = mesh_lib.create_mesh(fsdp=2, tp=2)
  s = mesh_lib.batch_sharding(mesh)
  assert s.spec == P(('data', 'fsdp'))


def test_tp_training_matches_dp(tmp_path):
  """One super-step under data x fsdp x tensor equals pure DP (same seed)."""
  config = tiny_synthetic.get_config()
  config.model.sm_pdrop = 0.0

  def run(fsdp, tp):
    config.training.fsdp = fsdp
    config.training.tp = tp
    exp = Experiment(config)
    state = exp._put_state(exp.state)
    batch = next(exp.train_iter)
    state, metrics = exp._p_superstep(state, exp._put_superbatch(batch))
    return (jax.device_get(jax.tree.map(np.asarray, state.params)),
            float(jnp.mean(metrics['bpd'])))

  params_dp, bpd_dp = run(1, 1)
  params_tp, bpd_tp = run(2, 2)
  np.testing.assert_allclose(bpd_tp, bpd_dp, rtol=1e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
      params_tp, params_dp)


def test_tp_activations_stay_channel_sharded():
  """Column-parallel placement alone lets GSPMD re-replicate activations
  between layers (tp>1 silently degenerating to replicated compute). The
  UNet pins every block output's channel axis to 'tensor'
  (mesh.constrain_activation_channels); this inspects the train step's IR:

    1. the lowered module carries >= one sharding constraint per ResNet
       block with the LAST axis on 'tensor';
    2. the compiled per-device module computes convolutions with HALVED
       output channels — the tensor axis genuinely reduces per-chip work.
  """
  config = tiny_synthetic.get_config()
  config.training.fsdp = 1
  config.training.tp = 2
  config.model.sm_pdrop = 0.0
  exp = Experiment(config)
  state = exp._put_state(exp.state)
  batch = exp._put_superbatch(next(exp.train_iter))
  lowered = exp._p_superstep.lower(state, batch)

  txt = lowered.as_text()
  # shardy ('sharding_constraint ... {"tensor"}]') or legacy GSPMD
  # ('custom_call @Sharding' with an mhlo.sharding devices=[1,1,1,2] attr)
  sites = [s for s in re.findall(r'sharding_constraint.*', txt)
           if '"tensor"' in s.rsplit(',', 1)[-1]]
  if not sites:
    sites = [s for s in re.findall(r'custom_call @Sharding.*', txt)
             if 'devices=' in s]
  n_blocks = 2 * config.model.sm_n_layer + 3  # score UNet res blocks / fwd
  assert len(sites) >= n_blocks, (len(sites), n_blocks)

  ctxt = lowered.compile().as_text()
  per_dev_batch = config.training.batch_size_train // (
      exp.mesh.shape['data'])
  half_ch = config.model.sm_n_embd // 2
  img = config.model.image_size
  halved = re.findall(
      rf'f32\[{per_dev_batch},{img},{img},{half_ch}\]\S* convolution', ctxt)
  assert halved, 'no channel-halved convolutions in the partitioned module'


def test_tp_params_actually_sharded():
  config = tiny_synthetic.get_config()
  config.training.fsdp = 1
  config.training.tp = 4
  exp = Experiment(config)
  state = exp._put_state(exp.state)
  kernel = state.params['score_model']['conv_in']['kernel']
  assert 'tensor' in str(kernel.sharding.spec)
  assert kernel.addressable_shards[0].data.nbytes < kernel.nbytes
  # gamma group stays replicated (parallel/mesh.py REPLICATED_GROUPS)
  for leaf in jax.tree.leaves(state.params['gamma']):
    assert leaf.sharding.spec == P(), leaf.sharding
