#!/usr/bin/env bash
# Pod-slice job dispatcher — counterpart of the reference's train/wrapper.sh
# (SLURM sbatch there; TPU pod slices here). Runs the given training command
# on every worker of a multi-host slice, or locally when no pod metadata is
# present.
#
# Usage: train/launch.sh train/train.sh -d DATASET ...
set -euo pipefail

if command -v gcloud >/dev/null 2>&1 && [[ -n "${TPU_NAME:-}" ]]; then
  # multi-host slice: fan the command out to every worker
  exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
    --command "cd $(pwd) && $*"
fi

# single host (or inside a worker): run directly; JAX picks up the slice
# topology from the TPU runtime environment.
exec "$@"
