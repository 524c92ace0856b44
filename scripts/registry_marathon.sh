#!/bin/bash
# Long-running tuned-registry growth driver (r2 verdict #3: >=200 verified
# entries). Runs scripts/tune_zoo.py passes in priority order under a stall
# watchdog: the tunnel remote-compile occasionally wedges a process forever
# with no CPU and no output, which neither SIGALRM nor a timeout(1) around
# python can reliably interrupt — so the watchdog kills the process group
# when the log stops growing and relaunches the (resumable) pass.
#
# Usage: setsid nohup bash scripts/registry_marathon.sh > /tmp/marathon.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
# the repo is not pip-installed and nohup environments may lack both the
# repo root and the axon PJRT plugin path (required for the TPU tunnel)
export PYTHONPATH="$(pwd):/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/flute_tpu_jaxcache}

STALL_SECS=${STALL_SECS:-720}   # no log growth for this long => wedged
PASS_RETRIES=${PASS_RETRIES:-4} # consecutive wedges before moving on
LOG=/tmp/tune_zoo_pass.log

# Priority order: the bench stack at the bench M first (w4sym is the
# production 4-bit layout), then bf16 G64 decode (M=16) across widths
# (the serving fast path), then prefill M=256, then G128. No float16
# pass: Mosaic on v5e rejects f16 vectors outright ("Unsupported type in
# mosaic dialect: 'f16'", BENCH_r04) — f16 runs under interpret-mode
# tests only. Each pass is resumable — already-registered entries are
# skipped.
PASSES=(
  "--set bench --m 8 --bits 4s,3 --groups 64 --max-candidates 8 --iters 60"
  "--set zoo --m 16 --bits 4s --groups 64 --max-candidates 6 --iters 40"
  "--set zoo --m 16 --bits 4 --groups 64 --max-candidates 6 --iters 40"
  "--set zoo --m 16 --bits 3 --groups 64 --max-candidates 6 --iters 40"
  "--set zoo --m 16 --bits 2 --groups 64 --max-candidates 6 --iters 40"
  "--set zoo --m 256 --bits 4s --groups 64 --max-candidates 6 --iters 40"
  "--set zoo --m 256 --bits 4 --groups 64 --max-candidates 6 --iters 40"
  "--set zoo --m 16 --bits 4s,4 --groups 128 --max-candidates 5 --iters 40"
  "--set zoo --m 256 --bits 3 --groups 64 --max-candidates 5 --iters 40"
  "--set zoo --m 1024 --bits 4s --groups 64 --max-candidates 5 --iters 40"
)

run_pass() {
  local pass_args=$1
  local tries=0
  while [ "$tries" -lt "$PASS_RETRIES" ]; do
    echo "=== pass: $pass_args (try $((tries + 1)))" | tee -a "$LOG"
    setsid python -u scripts/tune_zoo.py $pass_args >> "$LOG" 2>&1 &
    local pid=$!
    # watchdog: poll log size; kill the process group on stall
    while kill -0 "$pid" 2>/dev/null; do
      local sz0 sz1
      sz0=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      for _ in $(seq $((STALL_SECS / 30))); do
        sleep 30
        kill -0 "$pid" 2>/dev/null || break
      done
      kill -0 "$pid" 2>/dev/null || break
      sz1=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      if [ "$sz1" -eq "$sz0" ]; then
        echo "=== WATCHDOG: stalled ${STALL_SECS}s, killing pgid $pid" | tee -a "$LOG"
        kill -9 -- "-$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        tries=$((tries + 1))
        continue 2
      fi
    done
    wait "$pid"
    local rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "=== pass done: $pass_args" | tee -a "$LOG"
      return 0
    fi
    echo "=== pass exited rc=$rc; retrying" | tee -a "$LOG"
    tries=$((tries + 1))
  done
  echo "=== pass gave up after $PASS_RETRIES tries: $pass_args" | tee -a "$LOG"
  return 1
}

for p in "${PASSES[@]}"; do
  run_pass "$p"
  n=$(python -c "import json;print(len(json.load(open('flute_tpu/data/tuned_configs.json'))))")
  echo "=== registry now $n entries" | tee -a "$LOG"
done
echo "=== marathon complete"
