#!/usr/bin/env bash
# SLURM evaluation launcher (replaces the reference's tools/slurm_test.sh).
#   bash tools/slurm_test.sh <partition> <job-name> <config> <ckpt> [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
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
    bash "'"$(dirname "$0")"'/dist_test.sh" "'"$CONFIG"'" "'"$CHECKPOINT"'" '"$*"
