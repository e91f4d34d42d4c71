#!/usr/bin/env bash
# Round-3 remaining TPU measurement queue — run serially on the free chip
# (1-core host: NOTHING else may run concurrently; see .claude/skills/verify).
# Usage: bash tools/tpu_queue_r3.sh [logdir]
set -u
LOG=${1:-/tmp/tpuq}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -4 "$LOG/$name.log"
}

# 1. verify surface: demo generate (also confirms relay is up)
run demo_generate 2400 python -m pea_diffusion_tpu.cli.generate --demo \
    --prompt "一只猫" -o /tmp/out_r3.png
python -c "from PIL import Image; print('PNG', Image.open('/tmp/out_r3.png').size)" || exit 1

# 2. batch-4 retry (3x HTTP 500 platform flake on previous sessions)
run bench_b4 3600 python bench.py --sweep 4

# 3. the reference's exact micro-batch: mb10 @640 with all three levers
run train_mb10 3600 python bench_train.py --batch 10 --size 640 \
    --vae-dtype bfloat16 --vae-chunk 1 --tap-dtype bfloat16 --no-dpad

echo "=== queue done $(date -u +%H:%M:%S) ==="
