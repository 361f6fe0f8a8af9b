#!/usr/bin/env bash
# Slurm launcher (mirror of the reference slurm_train.sh): one task per
# host; jax.distributed picks up the Slurm environment automatically.
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
NODES=${NODES:-1}
shift 3
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/train.py" "$CONFIG" --launcher jax "$@"
