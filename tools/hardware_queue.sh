#!/bin/bash
# Unattended on-chip measurement queue (round 3).
#
# The axon tunnel drops for hours at a time; this script turns "the chip is
# back" into one command. Stages run sequentially (one host core, 2-4 min
# first-compiles), each writes its artifact under $OUT and drops a .done
# marker so a rerun resumes where it left off.
#
#   bash tools/hardware_queue.sh [OUT_DIR]
#
# Stages:
#   1 bench_off        official bench, run-to-completion engine
#   2 bench_on         official bench, continuous batching (device refill)
#   3 batch_scaling    in-loop step time vs batch x weight dtype
#   4 decode_bench     fixed-token decode microbench, batch {16,24,32} x
#                      quant {int8,int4}
#   5 grammar_152k     152k-vocab note grammar at qwen2vl-7b geometry
#   6 train_base       base-r3 grounded retrain ON CHIP (long; backgrounded,
#                      pid in $OUT/train_base.pid)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/tmp/hwq}
mkdir -p "$OUT"

log() { echo "[hwq $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

# --- liveness gate (jax.devices() hangs when the tunnel is down) ---------
# 240 s: a HEALTHY tunnel's cold backend init is 80-150 s per process.
if ! timeout 240 python - <<'EOF' >"$OUT/devices.txt" 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
print(ds)
EOF
then
  log "tunnel DOWN (probe timed out / cpu-only): $(tail -1 "$OUT/devices.txt" 2>/dev/null)"
  exit 3
fi
log "tunnel UP: $(cat "$OUT/devices.txt")"

stage() { # stage NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; log "done $name: $(tail -1 "$OUT/$name.log")"
  else
    log "FAIL $name (exit $?; tail): $(tail -3 "$OUT/$name.log" | tr '\n' ' ')"
  fi
}

stage roofline 1800 python tools/roofline.py
stage bench_off 6000 python bench.py
cp -f /tmp/bench_extras.json "$OUT/bench_off_extras.json" 2>/dev/null || true
stage bench_on 6000 env VTX_BENCH_CONTINUOUS=1 python bench.py
stage batch_scaling 4800 python tools/batch_scaling.py
for b in 16 24 32; do
  for q in int8 int4; do
    stage "decode_b${b}_${q}" 4800 env VTX_DB_BATCH=$b VTX_DB_QUANT=$q \
      VTX_DB_VARIANTS=full python tools/decode_bench.py
  done
done
stage grammar_152k 4800 env VTX_TEST_PLATFORM=axon \
  python -m pytest "tests/test_tpu_integration.py::TestTPUEndToEnd::test_152k_grammar_at_7b_geometry" -q

if [ ! -e "$OUT/train_base.started" ]; then
  log "launching base-r3 grounded retrain on chip (background)"
  nohup timeout 36000 bash tools/train_base_r3.sh >"$OUT/train_base.log" 2>&1 &
  echo $! >"$OUT/train_base.pid"
  touch "$OUT/train_base.started"
fi
log "queue complete"
