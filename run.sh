#!/bin/bash
# SLURM / standalone launcher (parity: /root/reference/run.sh).
#
# Usage (single host):
#   ./run.sh -m mulan_tpu.main --mode train \
#       --config=mulan_tpu/configs/cifar10_conditioned.py --workdir=runs/
# Under sbatch, preemption requeues the job and training auto-resumes from
# the latest checkpoint in the workdir (orbax restore-or-initialize).
#
#SBATCH -o watch_folder/%j.out
#SBATCH --open-mode=append
#SBATCH --signal=SIGUSR1@90
#SBATCH --requeue

export XLA_PYTHON_CLIENT_MEM_FRACTION=0.85
# export JAX_DEBUG_NANS=True   # debug toggle (see --jax_debug_nans flag)

srun_or_direct() {
  if command -v srun >/dev/null 2>&1 && [ -n "${SLURM_JOB_ID:-}" ]; then
    srun python "$@"
  else
    python "$@"
  fi
}

srun_or_direct "$@"
