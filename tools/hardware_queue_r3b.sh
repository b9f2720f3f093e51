#!/bin/bash
# Post-retrain on-chip measurement queue (round 3, late).
#
# Run AFTER tools/train_base_r3.sh finishes (the stages share the chip
# with nothing). Same resume discipline as tools/hardware_queue.sh:
# each stage drops a .done marker under $OUT.
#
#   bash tools/hardware_queue_r3b.sh [OUT_DIR]
#
# Stages:
#   1 eval_base_r3    grounded eval of every base-r3 checkpoint
#                     (16 topics + 8 composites) -> pick the best
#   2 bench_off       official bench, run-to-completion engine
#   3 bench_on        official bench, paged batcher (bucketed stage +
#                     refill-period chunk) — the OFF/ON decision data
#   4 grammar_152k    152k-vocab grammar at 7b geometry (tokenizer-aware
#                     close bias — the fix for the morning's accept miss)
#   5 decode_ablate   decode_bench variant sweep (full,nogrammar,noforce,
#                     ref_attn) at batch 16/32 int8 — where the per-step
#                     serving extras go
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/tmp/hwq_r3b}
mkdir -p "$OUT"

log() { echo "[hwq $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

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

# Optional wall-clock deadline (epoch seconds): stages are skipped once
# passed, so the queue never collides with the driver's end-of-round bench.
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

# Block-width ablation FIRST: fast, and its result decides the serving
# max_forced_run default before the official bench stages run.
stage decode_ablate_b16 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,nofuse,nogrammar,noforce,force4,ref_attn \
  python tools/decode_bench.py
# Speculative-decoding mechanism bounds (random weights): specself is the
# acceptance~1 ceiling, spectiny the acceptance~0 floor. The real
# draft/target pair is measured by the spec_eval stage below.
stage decode_spec_b16 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=specself,spectiny VTX_DB_SPEC_K=6 python tools/decode_bench.py
stage decode_spec_b16_k10 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=specself VTX_DB_SPEC_K=10 python tools/decode_bench.py
stage decode_ablate_b32 4800 env VTX_DB_BATCH=32 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,nogrammar,noforce,force4 python tools/decode_bench.py
# Wide batch x speculative: the two levers compose — if neither alone
# clears 8k tok/s (r3 verdict #5), this is the row that decides whether
# the serving default becomes batch32+draft.
stage decode_spec_b32 4800 env VTX_DB_BATCH=32 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=specself,spectiny VTX_DB_SPEC_K=6 python tools/decode_bench.py

CKPT_DIR=${VTX_BASE_CKPT:-data/checkpoints/base-zh-grounded-r3}
if [ -d "$CKPT_DIR" ]; then
  # One process, newest checkpoint first: restore() swaps params in place so
  # the minutes-long generate compile is paid once for the whole sweep, and
  # a timeout still leaves the final checkpoint scored.
  # (eval exits 1 when any clip misses — still a completed measurement, so
  #  swallow the scoring exit code to keep the .done marker.)
  stage eval_base_r3 7200 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint '$CKPT_DIR' --all-checkpoints \
    --tokenizer data/tokenizers/bpe-zh-2048.json \
    --topics 16 --composites 8 --batch 8 || true"
fi

# Out-of-distribution grounding: the final base-r3 checkpoint scored on
# held-out style shifts (train/shifts.py) — renderer-memorization vs
# signature-reading. Final checkpoint only (shifts multiply eval cost x7).
if [ -d "$CKPT_DIR" ]; then
  stage eval_base_r3_ood 7200 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint '$CKPT_DIR' \
    --tokenizer data/tokenizers/bpe-zh-2048.json \
    --topics 16 --shifts all --batch 8 || true"
fi

# Speculative decoding on the REAL pair: base-r3 target, shipped tiny
# draft (same BPE vocab). Reports greedy parity, acceptance/cycle, OFF/ON
# tok/s — the serving-default decision data for engine.draft.
if [ -d "$CKPT_DIR" ]; then
  stage spec_eval 4800 env VTX_SPEC_K=6 VTX_SPEC_BATCH=8 VTX_SPEC_CLIPS=16 \
    python tools/spec_eval.py \
    --target "$CKPT_DIR" \
    --draft data/checkpoints/tiny-zh-grounded \
    --tokenizer data/tokenizers/bpe-zh-2048.json
  stage spec_eval_k10 4800 env VTX_SPEC_K=10 VTX_SPEC_BATCH=8 VTX_SPEC_CLIPS=16 \
    python tools/spec_eval.py \
    --target "$CKPT_DIR" \
    --draft data/checkpoints/tiny-zh-grounded \
    --tokenizer data/tokenizers/bpe-zh-2048.json
fi

stage bench_off 6000 python bench.py
cp -f /tmp/bench_extras.json "$OUT/bench_off_extras.json" 2>/dev/null || true
stage bench_on 6000 env VTX_BENCH_CONTINUOUS=1 python bench.py
stage grammar_152k 4800 env VTX_TEST_PLATFORM=axon \
  python -m pytest "tests/test_tpu_integration.py::TestTPUEndToEnd::test_152k_grammar_at_7b_geometry" -q
stage spec_onchip 2400 env VTX_TEST_PLATFORM=axon \
  python -m pytest "tests/test_tpu_integration.py::TestTPUEndToEnd::test_speculative_decode_runs_on_chip" -q
# Multi-wave sweep (40 segments > segment_batch 32): the regime the
# batcher exists for — OFF pays the straggler tail per wave, ON refills
# across the boundary. Decides whether "auto" keeps its threshold.
stage bench_seg15_off 6000 env VTX_BENCH_SEGMENT_SECONDS=15 \
  VTX_BENCH_CONTINUOUS=0 python bench.py
stage bench_seg15_on 6000 env VTX_BENCH_SEGMENT_SECONDS=15 \
  VTX_BENCH_CONTINUOUS=1 python bench.py
# int4 decode re-measure: the Pallas fused dequant kernel only became
# Mosaic-legal with the i32 unpack (6df94da) — the morning numbers were
# the slow XLA-materialize path.
# Narrow widths matter here: with less block compute the step goes
# bandwidth-bound, which is where int4's halved weight stream can win.
stage decode_b16_int4 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int4 \
  VTX_DB_VARIANTS=full,force4,noforce python tools/decode_bench.py
stage decode_b32_int4 4800 env VTX_DB_BATCH=32 VTX_DB_QUANT=int4 \
  VTX_DB_VARIANTS=full,force4,noforce python tools/decode_bench.py
# int4 quality gate on the final base-r3 checkpoint (int4 can only become
# a serving default if grounding holds at the coarser resolution).
if [ -d "$CKPT_DIR" ]; then
  stage eval_base_int4 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint '$CKPT_DIR' --quantize int4 \
    --tokenizer data/tokenizers/bpe-zh-2048.json \
    --topics 16 --composites 8 --batch 8 || true"
fi
stage batcher_profile 4800 python tools/batcher_profile.py

# Conditional plan B: composite-focused finetune from the best base-r3
# checkpoint, ONLY if the eval above left two-signature composites < 6/8.
if [ -e "$OUT/eval_base_r3.done" ]; then
  stage composite_rescue 7200 bash tools/composite_rescue.sh \
    "$OUT/eval_base_r3.log"
fi

# (The tiny-r3 retrain + its eval + the fresh-draft spec_eval moved to the
# END of tools/hardware_queue_r4.sh: they are spare-time stages, and with
# one chip they must not starve the round-4 prompt-unification finetunes
# and the final bench out of the deadline window.)
log "queue complete"
