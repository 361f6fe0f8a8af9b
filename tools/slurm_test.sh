#!/usr/bin/env bash
# Slurm eval launcher (mirror of the reference slurm_test.sh).
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
NODES=${NODES:-1}
shift 4
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --launcher jax "$@"
