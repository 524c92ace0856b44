#!/bin/bash
# TPU-outage recovery driver: poll the tunnel until a real device op
# succeeds, then (1) record the headline bench to /tmp/bench_recover.json,
# (2) launch the registry marathon (scripts/registry_marathon.sh).
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

# 1. headline bench on a quiet chip (retry once: post-outage first
# contact sometimes throws a transient backend error)
for _ in 1 2; do
  timeout 580 python -u bench.py > /tmp/bench_recover.json \
    2> /tmp/bench_recover.err && break
  echo "$(date -u +%H:%M:%S) bench.py failed; retrying once"
  sleep 60
done
echo "bench result:"; cat /tmp/bench_recover.json

# 2. long-running registry growth (resumable, self-watchdogged)
echo "$(date -u +%H:%M:%S) starting registry marathon"
bash scripts/registry_marathon.sh
