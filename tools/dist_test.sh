#!/usr/bin/env bash
# Multi-host eval launcher (mirror of the reference dist_test.sh).
CONFIG=$1
CHECKPOINT=$2
shift 2
COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-"127.0.0.1:29500"} \
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --launcher jax "$@"
