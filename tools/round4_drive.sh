#!/bin/bash
# Round-4 single-chip orchestrator. Serializes everything that needs the
# TPU so stages never contend for the one chip:
#
#   A bench_early   official bench.py capture the moment the tunnel is up
#                   (VERDICT r3 #1: the round-3 bench failed rc=2; the
#                   official record must land EARLY, not at round end)
#   B resume train  base-r3 from the newest committed insurance snapshot
#                   to step 3000, preserver committing 2700 + final
#   C hwq_r3b       full deferred measurement program (evals, OFF/ON
#                   benches, spec_eval, 152k grammar, int4 gates, ...)
#   D hwq_r4        prompt-profile unification finetunes + final bench
#
#   bash tools/round4_drive.sh [OUT_DIR]
#
# Resumable: stage markers under $OUT (repo-anchored so they survive the
# session; a container recycle still kills them along with everything
# else, in which case just re-run — inner queues have their own .done).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

OUT=${1:-/root/repo/data/output/hwq_r4drive}
mkdir -p "$OUT"
log() { echo "[r4 $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

if ! timeout 240 python - <<'EOF' >"$OUT/devices.txt" 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
print(ds)
EOF
then
  log "tunnel DOWN: $(tail -1 "$OUT/devices.txt" 2>/dev/null)"
  exit 3
fi
log "tunnel UP: $(cat "$OUT/devices.txt")"

# --- A: official bench capture ------------------------------------------
if [ ! -e "$OUT/bench_early.done" ]; then
  log "stage bench_early"
  if timeout 6000 python bench.py >"$OUT/bench_early.log" 2>&1; then
    touch "$OUT/bench_early.done"
    cp -f /tmp/bench_extras.json "$OUT/bench_early_extras.json" 2>/dev/null || true
    log "bench_early: $(grep -o '{.*}' "$OUT/bench_early.log" | tail -1)"
  else
    log "bench_early FAIL (tail): $(tail -3 "$OUT/bench_early.log" | tr '\n' ' ')"
  fi
fi

# --- B: finish the base-r3 retrain (2400 -> 3000) ------------------------
CKPT=data/checkpoints/base-zh-grounded-r3
INSURANCE_DIR=data/checkpoints/base-zh-grounded-r3-insurance
if [ ! -d "$CKPT/params_3000" ] && [ ! -d "$INSURANCE_DIR/params_3000" ]; then
  LATEST=$(ls -d "$INSURANCE_DIR"/params_* | sort -t_ -k2 -n | tail -1)
  STEP=${LATEST##*_}
  TODO=$((3000 - STEP))
  log "resuming base-r3 from $LATEST ($TODO steps to go)"
  python -m video_transformer_tpu.train.run \
    --preset base --steps "$TODO" --batch 8 --text-len 2048 \
    --grounded --grounded-cache 4096 --grounded-composite 0.35 \
    --grounded-band 0.15 \
    --tokenizer data/tokenizers/bpe-zh-2048.json \
    --remat --prompt-profile compact \
    --init-from "$LATEST" \
    --out "$CKPT" \
    --checkpoint-every 300 --log-dir data/output/logs \
    >"$OUT/train_resume.log" 2>&1 &
  TRAIN_PID=$!
  echo "$TRAIN_PID" > "$OUT/train.pid"
  bash tools/preserve_checkpoints.sh "$TRAIN_PID" "$CKPT" \
    "$INSURANCE_DIR" 2700 >"$OUT/preserve.log" 2>&1 &
  PRESERVE_PID=$!
  wait "$TRAIN_PID"
  log "training exited: $(tail -1 "$OUT/train_resume.log")"
  wait "$PRESERVE_PID" 2>/dev/null || true
else
  log "params_3000 already present; skipping training"
fi
# If the live run dir is gone (recycle) but insurance has everything,
# point the eval queue at the insurance dir instead.
BASE_FOR_EVAL=$CKPT
[ -d "$CKPT/params_3000" ] || BASE_FOR_EVAL=$INSURANCE_DIR

# --- C: deferred measurement program --------------------------------------
log "stage hwq_r3b -> $OUT/r3b (base=$BASE_FOR_EVAL)"
VTX_BASE_CKPT=$BASE_FOR_EVAL bash tools/hardware_queue_r3b.sh "$OUT/r3b" \
  >>"$OUT/drive.log" 2>&1 || log "hwq_r3b exited $?"

# --- D: prompt unification + final bench ----------------------------------
log "stage hwq_r4 -> $OUT/r4"
VTX_BASE_CKPT=$BASE_FOR_EVAL bash tools/hardware_queue_r4.sh "$OUT/r4" \
  >>"$OUT/drive.log" 2>&1 || log "hwq_r4 exited $?"

log "round-4 drive complete"
