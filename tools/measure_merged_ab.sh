#!/bin/bash
# One-shot on-chip A/B of the merged student pass (round-3 optimization,
# pfst_tpu/models/uda/pfgst.py forward_train): sequential two-pass vs
# merged vmapped pass, device-resident inputs (tunnel-safe protocol,
# PERF.md "Measurement protocol"). Appends JSON lines to
# work_dirs/merged_ab.jsonl. Run when jax.devices() shows the TPU.
set -u
cd "$(dirname "$0")/.."
OUT=work_dirs/merged_ab.jsonl
mkdir -p work_dirs
for variant in merged no-merge; do
  for b in 2 8; do
    extra=""
    [ "$variant" = no-merge ] && extra="--no-merge"
    echo "== $variant batch $b ==" >&2
    rm -f /tmp/merged_ab_one.jsonl
    timeout 3600 python bench_train.py --batch "$b" --dtype bf16 \
      --device-inputs --flops $extra \
      --json-out /tmp/merged_ab_one.jsonl >&2
    if [ -s /tmp/merged_ab_one.jsonl ]; then
      python - "$variant" <<'EOF' >> "$OUT"
import json, sys
for line in open('/tmp/merged_ab_one.jsonl'):
    rec = json.loads(line)
    rec['variant'] = sys.argv[1]
    print(json.dumps(rec))
EOF
    fi
  done
done
echo "results:" >&2
cat "$OUT" >&2
