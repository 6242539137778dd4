#!/usr/bin/env bash
# Multi-host data-parallel evaluation launcher (replaces the reference's
# tools/dist_test.sh which used torch.distributed.launch).
#
# Single host:
#   bash tools/dist_test.sh <config> <checkpoint> [extra test.py args...]
#
# Multi-host: run on every host with
#   COORDINATOR=host0:9999 NUM_PROCESSES=4 PROCESS_ID=<rank> \
#     bash tools/dist_test.sh <config> <checkpoint> ...
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2

if [[ -n "${COORDINATOR:-}" ]]; then
  export JAX_COORDINATOR="$COORDINATOR"
  export JAX_NUM_PROCESSES="${NUM_PROCESSES:-1}"
  export JAX_PROCESS_ID="${PROCESS_ID:-${SLURM_PROCID:-0}}"
fi

exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
