#!/bin/bash
# Round-4 session-2 single-chip drive. The container recycled after the
# early-round session: data/output (queue .done state, eval logs) and
# data/cache/jax are gone, but everything committed survived — the official
# bench (docs/bench_r4_early.json), base-r3 params_3000 (insurance dir),
# and the roofline corrections. This drive re-establishes the measurement
# record DURABLY: every stage log is git-committed the moment the stage
# finishes, so a recycle can never erase a measurement again.
#
# Priority order (one chip, ~4.5 h budget — the reprioritization logic of
# commit 8376011, adapted to the lost state):
#   1 eval_base3000      score the final base-r3 checkpoint (16+8) — fast,
#                        reproduces the lost 13/16+1/8 line, feeds rescue
#   2 decode_b64/b128    wide-batch rows (the 8k tok/s decision data)
#   3 composite_rescue   composite-focused finetune from params_3000
#   4 spec_eval          real-pair OFF/ON tok/s -> engine.draft default
#   5 seg15 off/on       multi-wave benches -> continuous_batching default
#   6 grammar_152k + spec_onchip   deferred correctness gates
#   7 bench_final        official line at the decided defaults
#   8 spare: tiny mixed-profile finetune + evals, OOD, int4 quality gate
#
#   bash tools/round4b_drive.sh [OUT_DIR] (default data/measurements/r4)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r4}
mkdir -p "$OUT"

log() { echo "[r4b $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

probe_tunnel() {
  timeout 240 python - >/dev/null 2>&1 <<'PROBE'
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
PROBE
}

if ! probe_tunnel; then
  log "tunnel DOWN at start"
  exit 3
fi
log "tunnel UP"

DEADLINE=${VTX_QUEUE_DEADLINE:-$(cat /root/repo/data/output/queue_deadline 2>/dev/null || echo 0)}

commit_stage() { # commit_stage NAME
  git add "$OUT" >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round-4 session 2)" \
    -- "$OUT" >/dev/null 2>&1 || true
}

stage() { # stage NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    log "skip $name (past deadline)"; return 0
  fi
  log "start $name"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; log "done $name: $(tail -1 "$OUT/$name.log")"
    commit_stage "$name"
  else
    log "FAIL $name (exit $?; tail): $(tail -3 "$OUT/$name.log" | tr '\n' ' ')"
    commit_stage "$name (failed)"
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

TOK=data/tokenizers/bpe-zh-2048.json
BASE=data/checkpoints/base-zh-grounded-r3-insurance

# --- 1: reproduce the lost base-r3 eval line (final checkpoint only; the
# all-checkpoint sweep ran pre-recycle and picked params_3000 — 13/16
# single, 1/8 composite, recorded in commit 8376011's message) -----------
stage eval_base3000 5400 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $BASE/params_3000 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

# --- 2: wide-batch decode rows (r3 verdict #5: 8k tok/s) ----------------
stage decode_b64 4800 env VTX_DB_BATCH=64 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,force4,nogrammar python tools/decode_bench.py
stage decode_b128 4800 env VTX_DB_BATCH=128 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,force4 python tools/decode_bench.py

# --- 3: composite-grounding rescue (the round's biggest quality gap) ----
stage composite_rescue 9000 env VTX_RESCUE_STEPS=${VTX_RESCUE_STEPS:-400} \
  bash tools/composite_rescue.sh "$OUT/eval_base3000.log"

# --- 4: speculative decoding on the real pair -> engine.draft default ---
stage spec_eval 4800 env VTX_SPEC_K=6 VTX_SPEC_BATCH=8 VTX_SPEC_CLIPS=16 \
  python tools/spec_eval.py \
  --target "$BASE" \
  --draft data/checkpoints/tiny-zh-grounded \
  --tokenizer $TOK

# --- 5: multi-wave OFF/ON -> long_video.continuous_batching default -----
stage bench_seg15_off 6000 env VTX_BENCH_SEGMENT_SECONDS=15 \
  VTX_BENCH_CONTINUOUS=0 python bench.py
stage bench_seg15_on 6000 env VTX_BENCH_SEGMENT_SECONDS=15 \
  VTX_BENCH_CONTINUOUS=1 python bench.py

# --- 6: deferred on-chip correctness gates ------------------------------
stage grammar_152k 4800 env VTX_TEST_PLATFORM=axon \
  python -m pytest "tests/test_tpu_integration.py::TestTPUEndToEnd::test_152k_grammar_at_7b_geometry" -q
stage spec_onchip 2400 env VTX_TEST_PLATFORM=axon \
  python -m pytest "tests/test_tpu_integration.py::TestTPUEndToEnd::test_speculative_decode_runs_on_chip" -q

# --- 7: official bench at the decided serving defaults ------------------
cp -f data/output/decode_bench_runs.jsonl "$OUT/" 2>/dev/null || true
stage bench_final 6000 python bench.py
cp -f /tmp/bench_extras.json "$OUT/bench_final_extras.json" 2>/dev/null || true
commit_stage bench_final_extras

# --- 8: spare-time stages ------------------------------------------------
TINY_INIT=data/checkpoints/tiny-zh-grounded
SPEC_LEN=3712
TEXT_LEN=4736
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
stage eval_base_ood 7200 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $BASE/params_3000 \
  --tokenizer $TOK --topics 16 --shifts all --batch 8 || true"
stage eval_base_int4 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $BASE/params_3000 --quantize int4 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

log "round-4b drive complete"
