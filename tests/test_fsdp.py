"""FSDP (2-D data x fsdp mesh) sharding tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mulan_tpu.configs import tiny_synthetic
from mulan_tpu.parallel import mesh as mesh_lib
from mulan_tpu.train.loop import Experiment


def test_fsdp_sharding_picks_divisible_axis():
  mesh = mesh_lib.create_mesh(fsdp=4)
  s = mesh_lib.fsdp_sharding(mesh, (3, 3, 16, 32))
  assert s.spec == jax.sharding.PartitionSpec(None, None, None, 'fsdp')
  # not divisible anywhere -> replicated
  s = mesh_lib.fsdp_sharding(mesh, (3, 5))
  assert s.spec == jax.sharding.PartitionSpec()
  # scalars replicated
  s = mesh_lib.fsdp_sharding(mesh, ())
  assert s.spec == jax.sharding.PartitionSpec()


def test_fsdp_mesh_shape():
  mesh = mesh_lib.create_mesh(fsdp=2)
  assert mesh.axis_names == ('data', 'fsdp')
  assert mesh.shape['data'] == 4 and mesh.shape['fsdp'] == 2


def test_fsdp_training_matches_dp(tmp_path):
  """One super-step under FSDP equals pure DP (same config/seed)."""
  config = tiny_synthetic.get_config()
  config.model.sm_pdrop = 0.0

  def run(fsdp):
    config.training.fsdp = fsdp
    exp = Experiment(config)
    state = exp._put_state(exp.state)
    batch = next(exp.train_iter)
    state, metrics = exp._p_superstep(state, exp._put_superbatch(batch))
    return (jax.device_get(jax.tree.map(np.asarray, state.params)),
            float(jnp.mean(metrics['bpd'])))

  params_dp, bpd_dp = run(1)
  params_fsdp, bpd_fsdp = run(4)
  np.testing.assert_allclose(bpd_fsdp, bpd_dp, rtol=1e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
      params_fsdp, params_dp)


def test_fsdp_params_actually_sharded():
  config = tiny_synthetic.get_config()
  config.training.fsdp = 4
  exp = Experiment(config)
  state = exp._put_state(exp.state)
  kernel = state.params['score_model']['conv_in']['kernel']
  assert 'fsdp' in str(kernel.sharding.spec)
  # adam moments share the layout
  nbytes_local = kernel.addressable_shards[0].data.nbytes
  assert nbytes_local < kernel.nbytes


def test_fsdp_gamma_group_replicated():
  """The gamma schedule group must stay replicated under FSDP (sharding it
  forced involuntary full-rematerialization collectives on every gamma grad,
  see parallel/mesh.py REPLICATED_GROUPS)."""
  config = tiny_synthetic.get_config()
  config.training.fsdp = 2
  exp = Experiment(config)
  state = exp._put_state(exp.state)
  empty = jax.sharding.PartitionSpec()
  for tree in (state.params['gamma'], state.ema_params['gamma']):
    leaves = jax.tree.leaves(tree)
    assert leaves, 'gamma group unexpectedly empty'
    for leaf in leaves:
      assert leaf.sharding.spec == empty, leaf.sharding
  # ...while the UNet is genuinely sharded on the same mesh.
  shardings = mesh_lib.state_shardings(exp.mesh, exp.state)
  sm_specs = {str(s.spec) for s in jax.tree.leaves(shardings.params)}
  assert any('fsdp' in s for s in sm_specs)
