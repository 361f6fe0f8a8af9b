#!/usr/bin/env bash
# Slurm convenience wrapper (mirror of the reference tools/train.sh):
#   bash tools/train.sh <partition> <job_name> <config> [extra args...]
# NODES controls host count; one task per host (chips are local).
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NODES=${NODES:-1}
SRUN_ARGS=${SRUN_ARGS:-""}
shift 3

PYTHONPATH="$(dirname "$0")/..":$PYTHONPATH \
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --nodes="${NODES}" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/train.py" "${CONFIG}" --launcher jax "$@"
