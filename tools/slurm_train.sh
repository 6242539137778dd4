#!/usr/bin/env bash
# SLURM training launcher (replaces the reference's tools/slurm_train.sh,
# which wrapped srun + torch.distributed; here each task is one JAX
# process and jax.distributed derives the topology from env).
#
#   GPUS_PER_NODE is meaningless on TPU pods; each task owns the host's
#   chips.  Usage:
#     bash tools/slurm_train.sh <partition> <job-name> <config> [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-}

srun -p "$PARTITION" \
  --job-name="$JOB_NAME" \
  --nodes="$NODES" \
  --ntasks="$NODES" \
  --ntasks-per-node=1 \
  --kill-on-bad-exit=1 \
  $SRUN_ARGS \
  bash -c 'COORDINATOR=${COORDINATOR:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -1):9999} \
    NUM_PROCESSES=$SLURM_NTASKS PROCESS_ID=$SLURM_PROCID \
    bash "'"$(dirname "$0")"'/dist_train.sh" "'"$CONFIG"'" '"$*"
