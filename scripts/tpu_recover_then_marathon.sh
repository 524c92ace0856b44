#!/bin/bash
# TPU-outage recovery driver — the single on-chip queue for round 3.
# Polls the tunnel until a real device op succeeds, then in order:
#   1. finish the bench-shape retune (deep-grid configs for o/qkv/down,
#      scripts/retune_bench_shapes.py, resumable, 3 tries)
#   2. record the headline bench to /tmp/bench_recover.json
#   3. grow the tuned registry (scripts/registry_marathon.sh, resumable)
# Only ONE instance may run: on-chip timings are contaminated by any
# concurrent chip or host-CPU load (docs/BENCH_NOTES.md).
# Usage: setsid nohup bash scripts/tpu_recover_then_marathon.sh \
#          > /tmp/recover.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) == 256 * 256 * 256
print('TPU OK:', jax.devices()[0].device_kind)
" 2>&1 | grep "TPU OK"
}

echo "$(date -u +%H:%M:%S) polling for TPU tunnel recovery"
until probe; do
  echo "$(date -u +%H:%M:%S) tunnel still down; retry in 180s"
  sleep 180
done
echo "$(date -u +%H:%M:%S) tunnel recovered"

echo "=== phase 1: retune bench shapes $(date -u +%H:%M:%S)"
for try in 1 2 3; do
  setsid timeout 3000 python -u scripts/retune_bench_shapes.py --reps 5 \
    > /tmp/r3_retune_resume.log 2>&1
  rc=$?
  echo "  retune try $try rc=$rc"
  [ "$rc" -eq 0 ] && break
  probe || { echo "  TPU down again; waiting"; until probe; do sleep 180; done; }
done

echo "=== phase 2: headline bench $(date -u +%H:%M:%S)"
for _ in 1 2; do
  timeout 580 python -u bench.py > /tmp/bench_recover.json \
    2> /tmp/bench_recover.err && break
  echo "$(date -u +%H:%M:%S) bench.py failed; retrying once"
  sleep 60
done
echo "bench result:"; cat /tmp/bench_recover.json

echo "=== phase 3: registry marathon $(date -u +%H:%M:%S)"
bash scripts/registry_marathon.sh
echo "=== pipeline complete $(date -u +%H:%M:%S)"
