#!/bin/bash
# Round-4 on-chip queue: retire the spec-vs-compact prompt split
# (VERDICT r3 #9) and close the round with a fresh official bench.
#
#   bash tools/hardware_queue_r4.sh [OUT_DIR]
#
# Stages (same .done resume discipline + VTX_QUEUE_DEADLINE skipping as
# tools/hardware_queue_r3b.sh):
#   1 train_spec_tiny   mixed-profile finetune of the newest tiny checkpoint
#                       (per-row 50/50 compact/spec, --prompt-len 3712) —
#                       cheap proof that one checkpoint serves BOTH profiles
#   2 eval_tiny_spec    eval_grounding --prompt-profile spec on the finetune
#   3 eval_tiny_compact same checkpoint under compact (the >= bar)
#   4 train_spec_base   same mixed finetune from the final base-r3 checkpoint
#   5 eval_base_spec / eval_base_compact
#   6 bench_final       official bench at whatever serving defaults the
#                       round's measurements decided
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/tmp/hwq_r4}
mkdir -p "$OUT"

log() { echo "[hwq4 $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

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

DEADLINE=${VTX_QUEUE_DEADLINE:-$(cat /root/repo/data/output/queue_deadline 2>/dev/null || echo 0)}

stage() { # stage NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    log "skip $name (past deadline)"; return 0
  fi
  log "start $name"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; log "done $name: $(tail -1 "$OUT/$name.log")"
  else
    log "FAIL $name (exit $?; tail): $(tail -3 "$OUT/$name.log" | tr '\n' ' ')"
    # A downed tunnel hangs jax.devices() in every later stage, burning each
    # stage's FULL timeout. After any failure, probe once; if the tunnel is
    # down, poll until it answers (or the deadline passes) so the queue
    # resumes the moment the chip is back instead of bleeding hours.
    until probe_tunnel; do
      if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
        log "tunnel down after $name and deadline passed; abandoning queue"
        return 1
      fi
      log "tunnel down after $name; re-probing in 300s"
      sleep 300
    done
  fi
}

probe_tunnel() {
  timeout 240 python - >/dev/null 2>&1 <<'PROBE'
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
PROBE
}

TOK=data/tokenizers/bpe-zh-2048.json
# Prompt geometry: the spec analysis prompt is 3,681 BPE tokens -> 3712
# block; grounded note bodies max ~1k tokens, so text-len 4736 leaves a
# full body after the widest block. Compact rows bucket to their own
# 128-multiple (256) inside the same static shape (_pack_row).
SPEC_LEN=3712
TEXT_LEN=4736

# Wide-batch decode rows FIRST (fast, and they are the r3-verdict-#5 "8k
# tok/s" decision data): aggregate tok/s kept climbing 16->32 (5637->6379)
# while decode stays op-bound, so the remaining lever is rows per dispatch.
stage decode_ablate_b64 4800 env VTX_DB_BATCH=64 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,force4,nogrammar python tools/decode_bench.py
stage decode_ablate_b128 4800 env VTX_DB_BATCH=128 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,force4 python tools/decode_bench.py

# Composite-grounding rescue next (moved from hardware_queue_r3b.sh so the
# one chip serves the round's biggest quality gap before the nice-to-have
# finetunes): base-r3 params_3000 scored 13/16 single but 1/8 composite —
# the rescue doubles the composite mix from the best checkpoint.
stage composite_rescue 7200 env VTX_RESCUE_STEPS=450 \
  bash tools/composite_rescue.sh \
  /root/repo/data/output/hwq_r4drive/r3b/eval_base_r3.log

TINY_INIT=data/checkpoints/tiny-zh-grounded
[ -d data/checkpoints/tiny-zh-grounded-r3b ] && TINY_INIT=data/checkpoints/tiny-zh-grounded-r3b
stage train_spec_tiny 3600 python -m video_transformer_tpu.train.run \
  --preset tiny --steps 800 --batch 8 --text-len $TEXT_LEN --lr 1e-4 \
  --grounded --grounded-cache 4096 --grounded-composite 0.35 \
  --grounded-band 0.15 \
  --tokenizer $TOK \
  --prompt-profile mixed --prompt-len $SPEC_LEN \
  --init-from "$TINY_INIT" \
  --out data/checkpoints/tiny-zh-grounded-r4mix \
  --checkpoint-every 200 --log-dir data/output/logs

if [ -d data/checkpoints/tiny-zh-grounded-r4mix ]; then
  stage eval_tiny_spec 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset tiny --checkpoint data/checkpoints/tiny-zh-grounded-r4mix \
    --all-checkpoints --prompt-profile spec \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
  stage eval_tiny_compact 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset tiny --checkpoint data/checkpoints/tiny-zh-grounded-r4mix \
    --all-checkpoints --prompt-profile compact \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
fi

# Official bench BEFORE the base finetune: the serving defaults are decided
# by this point and the record must not be hostage to a 75-minute training
# stage racing the deadline.
stage bench_final 6000 python bench.py
cp -f /tmp/bench_extras.json "$OUT/bench_final_extras.json" 2>/dev/null || true

BASE_INIT=${VTX_BASE_CKPT:-data/checkpoints/base-zh-grounded-r3}
if [ -d "$BASE_INIT" ]; then
  stage train_spec_base 6600 python -m video_transformer_tpu.train.run \
    --preset base --steps 400 --batch 8 --text-len $TEXT_LEN --lr 1e-4 \
    --grounded --grounded-cache 4096 --grounded-composite 0.35 \
    --grounded-band 0.15 \
    --tokenizer $TOK \
    --prompt-profile mixed --prompt-len $SPEC_LEN --remat \
    --init-from "$BASE_INIT" \
    --out data/checkpoints/base-zh-grounded-r4mix \
    --checkpoint-every 100 --log-dir data/output/logs
fi

if [ -d data/checkpoints/base-zh-grounded-r4mix ]; then
  stage eval_base_spec 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r4mix \
    --all-checkpoints --prompt-profile spec \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
  stage eval_base_compact 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r4mix \
    --all-checkpoints --prompt-profile compact \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
fi

# ---- Spare-time stages (moved from hardware_queue_r3b.sh so they never
# starve the finetunes/bench above): resume the tiny-r3 retrain (killed at
# step 800 when a prior container died — scores 0/16 undertrained), score
# it, and re-measure speculative acceptance with the fresh 48-topic draft
# (the shipped tiny predates the topic-bank extension, so its proposals on
# appended-topic content may under-accept against base-r3).
stage train_tiny_r3 3300 python -m video_transformer_tpu.train.run \
  --preset tiny --steps 2200 --batch 8 --text-len 2048 \
  --grounded --grounded-cache 4096 --grounded-composite 0.35 \
  --grounded-band 0.15 \
  --tokenizer $TOK \
  --prompt-profile compact \
  --init-from data/checkpoints/tiny-zh-grounded-r3/params_800 \
  --out data/checkpoints/tiny-zh-grounded-r3b \
  --checkpoint-every 300 --log-dir data/output/logs
stage eval_tiny_r3 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset tiny --checkpoint data/checkpoints/tiny-zh-grounded-r3b \
  --all-checkpoints \
  --tokenizer $TOK \
  --topics 16 --composites 8 --batch 8 || true"
if [ -d "$BASE_INIT" ] && [ -d data/checkpoints/tiny-zh-grounded-r3b ]; then
  stage spec_eval_r3b_draft 4800 env VTX_SPEC_K=6 VTX_SPEC_BATCH=8 \
    VTX_SPEC_CLIPS=16 python tools/spec_eval.py \
    --target "$BASE_INIT" \
    --draft data/checkpoints/tiny-zh-grounded-r3b \
    --tokenizer $TOK
fi
log "queue complete"
