#!/bin/bash
# Round-3 second-stage measurement queue: waits for BOTH the tunnel
# and the first-stage watcher (tools/wait_and_measure_r3.sh) to
# finish, then measures the eval-CLI path (device_put + one-image
# lookahead pipelining, pfst_tpu/apis/test.py) on the chip.
# Logs to work_dirs/r3_onchip/.  Writes pid to /tmp/r3measure_b.pid.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r3measure_b.pid
LOG=work_dirs/r3_onchip
mkdir -p "$LOG"

echo "$(date -u) stage-b waiting for tunnel + stage-a..." >> "$LOG/watch_b.log"
while true; do
    if curl -s -o /dev/null --max-time 5 http://127.0.0.1:8103/; then
        # tunnel up. Stage-a is finished when its log says so (the
        # authoritative marker — immune to pid-file races/reuse), or
        # when its recorded pid is provably dead.
        if grep -q 'ALL DONE' "$LOG/watch.log" 2>/dev/null; then
            break
        fi
        if [ -f /tmp/r3measure.pid ] && \
           ! kill -0 "$(cat /tmp/r3measure.pid)" 2>/dev/null; then
            break  # stage-a died mid-run; take over the chip
        fi
        sleep 120; continue
    fi
    sleep 60
done
echo "$(date -u) stage-b starting" >> "$LOG/watch_b.log"

run() {
    local name=$1; shift
    echo "$(date -u) START $name: $*" >> "$LOG/watch_b.log"
    timeout 5400 "$@" > "$LOG/$name.log" 2>&1
    echo "$(date -u) DONE  $name rc=$?" >> "$LOG/watch_b.log"
}

# a 64-tile val split so the eval-rate line (every 50 images) prints
run synth_val64 python tools/make_synthetic_data.py \
    -o data/Vaihingen_IRRG_eval64 --num-train 2 --num-val 64 --seed 9

# eval throughput through the REAL eval CLI on the stage-a checkpoint
# (falls back to the smoke ckpt if stage-a's train_recon was skipped)
CKPT=work_dirs/r3_onchip/train_recon/ckpt/60
[ -d "$CKPT" ] || CKPT=$(ls -d work_dirs/*/ckpt/* 2>/dev/null | tail -1)
run eval_rate python tools/test.py \
    configs/pfst/source_only_pots_irrg_deeplabv3plus_r50-d8.py \
    "$CKPT" --eval mIoU \
    --cfg-options data.test.data_root=data/Vaihingen_IRRG_eval64 \
                  data.workers_per_gpu=2

echo "$(date -u) stage-b ALL DONE" >> "$LOG/watch_b.log"
