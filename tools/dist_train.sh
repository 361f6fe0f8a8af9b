#!/usr/bin/env bash
# Multi-host training launcher (mirror of the reference dist_train.sh,
# torch.distributed.launch -> jax.distributed).
# Usage: NNODES=4 NODE_RANK=0 COORDINATOR_ADDRESS=host:1234 \
#        bash tools/dist_train.sh CONFIG [extra args]
CONFIG=$1
shift
COORDINATOR_ADDRESS=${COORDINATOR_ADDRESS:-"127.0.0.1:29500"}
EXTRA=()
if [ -n "${NNODES:-}" ]; then
  EXTRA+=(--num-processes "$NNODES")
fi
if [ -n "${NODE_RANK:-}" ]; then
  EXTRA+=(--process-id "$NODE_RANK")
fi
python "$(dirname "$0")/train.py" "$CONFIG" --launcher jax \
  --coordinator "$COORDINATOR_ADDRESS" "${EXTRA[@]}" "$@"
