#!/bin/bash
# Round-4 TPU work queue: run the remaining VERDICT-r3 measurement tasks
# back-to-back once the relay recovers. Each step is independently
# budgeted and logs to /tmp/r4_<step>.log; a failure moves on to the
# next step (partial evidence beats none if the relay wedges again).
#
# Usage: bash benchmarks/r4_queue.sh [from_step]
set -u
cd "$(dirname "$0")/.."
FROM="${1:-1}"

probe() {
  timeout 60 python -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print(float(np.asarray((x@x).sum())))" >/dev/null 2>&1
}

wait_relay() {
  for i in $(seq 1 60); do
    probe && return 0
    echo "relay probe $i failed; sleeping 60s" >&2
    sleep 60
  done
  return 1
}

step() {  # step <n> <name> <budget_s> <cmd...>
  local n="$1" name="$2" budget="$3"; shift 3
  [ "$n" -lt "$FROM" ] && return 0
  echo "=== step $n: $name (budget ${budget}s) ===" >&2
  wait_relay || { echo "relay never recovered; abort" >&2; exit 1; }
  timeout "$budget" "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  echo "step $n ($name) rc=$rc" >&2
  tail -3 "/tmp/r4_${name}.log" >&2
}

# 1. decode stream-floor proof (VERDICT #4 measured-proof arm)
step 1 decode_probe 1500 \
  python benchmarks/decode_probe_r4.py --batch 16 \
    --out /root/repo/DECODE_PROBE_r04.json

# 2. ingest-inclusive e2e (VERDICT #8)
step 2 e2e_ingest 3600 \
  python benchmarks/e2e_ingest.py --clips 48 --clip_batch 16 \
    --output /root/repo/BENCH_E2E_r04.json

# 3. full-scale serving bench (VERDICT #2 / round-2 #9)
step 3 serving 3600 \
  python benchmarks/serving_bench.py --model_size full --n 16 \
    --slots 8 --max_new 32 --mean_gap_ms 300 --timeout_s 1500 \
    --output /root/repo/SERVING_BENCH_FULL.json

# 4. training bench with stage attribution + MFU (VERDICT #3 / r2 #8)
step 4 train 3600 \
  python benchmarks/train_finetune_scale.py --batch 1 --bits 4 \
    --iters 3 --profile --output /root/repo/BENCH_TRAIN_r04.json

echo "queue done" >&2
