"""Driver-contract checks: entry() and dryrun_multichip() stay working."""

import importlib.util
import json
import subprocess
import sys

import jax
import numpy as np
import pytest


@pytest.fixture(scope='module')
def graft():
  spec = importlib.util.spec_from_file_location('graft_entry',
                                                '__graft_entry__.py')
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def test_dryrun_multichip_8(graft, capsys):
  graft.dryrun_multichip(8)
  out = capsys.readouterr().out
  assert 'dryrun_multichip(8)' in out


def test_dryrun_multichip_odd(graft, capsys):
  """Odd device counts fall back to a 1-D data mesh."""
  graft.dryrun_multichip(1)
  out = capsys.readouterr().out
  assert 'dryrun_multichip(1)' in out


def test_entry_shapes(graft):
  """entry() returns a jittable fn + args; run it (tiny trace check is the
  driver's job at full scale — here we just verify the contract with the
  flagship-architecture fn abstractly via eval_shape, no full compile)."""
  fn, args = graft.entry()
  out_shape = jax.eval_shape(fn, *args)
  assert out_shape.shape == ()
  assert out_shape.dtype == np.float32


def test_bench_script_parses():
  """bench.py at least imports and exposes main (full run needs the TPU)."""
  spec = importlib.util.spec_from_file_location('bench', 'bench.py')
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  assert callable(mod.main)
  assert mod.BASELINE_STEPS_PER_SEC_PER_CHIP > 0
