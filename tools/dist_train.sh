#!/usr/bin/env bash
# Multi-host data-parallel training launcher (replaces the reference's
# torch.distributed.launch dist_train.sh / slurm_train.sh).
#
# Single host (all local TPU chips are used automatically):
#   bash tools/dist_train.sh <config> [extra train.py args...]
#
# Multi-host: run on every host with
#   COORDINATOR=host0:9999 NUM_PROCESSES=4 PROCESS_ID=<rank> \
#     bash tools/dist_train.sh <config> ...
# (under SLURM, PROCESS_ID=$SLURM_PROCID NUM_PROCESSES=$SLURM_NTASKS.)
set -euo pipefail
CONFIG=$1
shift

if [[ -n "${COORDINATOR:-}" ]]; then
  export JAX_COORDINATOR="$COORDINATOR"
  export JAX_NUM_PROCESSES="${NUM_PROCESSES:-1}"
  export JAX_PROCESS_ID="${PROCESS_ID:-${SLURM_PROCID:-0}}"
fi

exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
