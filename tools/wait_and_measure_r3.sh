#!/bin/bash
# Round-3 on-chip measurement queue: waits for the TPU tunnel to
# return (remote-compile helper on 127.0.0.1:8103), then runs the
# pending measurements in order, logging to work_dirs/.  Safe to leave
# running; writes its pid to /tmp/r3measure.pid.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r3measure.pid
LOG=work_dirs/r3_onchip
mkdir -p "$LOG"

echo "$(date -u) waiting for tunnel..." >> "$LOG/watch.log"
while ! curl -s -o /dev/null --max-time 5 http://127.0.0.1:8103/; do
    rc=$?
    # connection refused (7) or timeout (28): keep waiting
    sleep 60
done
echo "$(date -u) tunnel is back (curl rc=$?)" >> "$LOG/watch.log"
sleep 30  # let it settle

run() {  # run NAME CMD...
    local name=$1; shift
    echo "$(date -u) START $name: $*" >> "$LOG/watch.log"
    timeout 5400 "$@" > "$LOG/$name.log" 2>&1
    echo "$(date -u) DONE  $name rc=$?" >> "$LOG/watch.log"
}

# 1. headline bench + train step + int8 A/B (one JSON line)
run bench python bench.py

# 2. train-step batch sweep at the sizes the round-2 verdict asked for
run bench_train_b16_24 python bench_train.py --device-inputs \
    --batch 16 24 --dtype bf16 --with-cp --steps 6 --flops \
    --json-out work_dirs/r3_onchip/bench_train_b16_24.jsonl

# 3. 60-iter real train CLI with the packed+tuned data path
run train_recon python tools/train.py \
    configs/pfst/pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py \
    --work-dir work_dirs/r3_onchip/train_recon --no-validate \
    --max-iters 60 --cfg-options log_config.interval=10 \
    checkpoint_config.interval=60

echo "$(date -u) ALL DONE" >> "$LOG/watch.log"
