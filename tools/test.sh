#!/usr/bin/env bash
# Convenience wrapper (mirror of the reference tools/test.sh): score a
# work_dirs checkpoint by config dir + experiment name + iteration and
# dump rendered predictions.
#   bash tools/test.sh <config_dir> <expr_name> <num_iter>
set -x

CONFIG_DIR=$1
EXPR_NAME=$2
NUM_ITER=$3

python "$(dirname "$0")/test.py" \
    "configs/${CONFIG_DIR}/${EXPR_NAME}.py" \
    "work_dirs/${EXPR_NAME}/ckpt/${NUM_ITER}" \
    --format-only --show-dir "work_dirs/${EXPR_NAME}/outputs"
