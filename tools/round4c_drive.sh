#!/bin/bash
# Round-4 session-3 single-chip drive. Session 2 completed the whole 4b
# queue + extras and decided the three serving defaults (max_forced_run=2,
# draft OFF, continuous_batching auto — docs/roofline.md). This session
# closes what is left:
#   1 grammar_152k_retry  the one failed gate: 152k-vocab grammar at 7b
#                         geometry died RESOURCE_EXHAUSTED staging the bf16
#                         source next to its int8 result; retry with the
#                         host-side quantization fix (engine._place)
#   2 decode_b16_force    full-vs-force2 at the official bench's fixed
#                         batch 16 — confirms the new default doesn't
#                         regress the decode_fixed line
#   3 bench_default       official bench at the new defaults (the driver
#                         reruns this at round end; fail early if off)
#   4 composite_rescue2   0.7 composite mix from the rescued checkpoint —
#                         5/8 needs one more pair for the 6/8 bar
#   5 train_spec_tiny     spec-profile unification finetune + both-profile
#                         evals (r3 verdict #9, deprioritized in session 2)
#   6 decode_b256_force2  spare: does the force2 curve keep climbing?
#
#   bash tools/round4c_drive.sh [OUT_DIR] (default data/measurements/r4)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r4}
mkdir -p "$OUT"

log() { echo "[r4c $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

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
  git commit -q -m "Record on-chip measurement: $1 (round-4 session 3)" \
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

# --- 1: the failed gate, with the host-quant placement fix ---------------
stage grammar_152k_retry 4800 env VTX_TEST_PLATFORM=axon \
  python -m pytest "tests/test_tpu_integration.py::TestTPUEndToEnd::test_152k_grammar_at_7b_geometry" -q

# --- 2: force2 at the bench's fixed batch 16 ------------------------------
stage decode_b16_force 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,force2 python tools/decode_bench.py

# --- 3: official bench at the new serving defaults ------------------------
stage bench_default 6000 python bench.py
cp -f /tmp/bench_extras.json "$OUT/bench_default_extras.json" 2>/dev/null || true
commit_stage bench_default_extras

# --- 4: composite rescue round 2 (0.7 mix, lr 7e-5, from r3c 3300) -------
stage composite_rescue2 9000 bash tools/composite_rescue2.sh 400

# --- 5: spec-profile unification (tiny mixed-profile finetune + evals) ----
TINY_INIT=data/checkpoints/tiny-zh-grounded
SPEC_LEN=3712
TEXT_LEN=4736
stage train_spec_tiny 5400 python -m video_transformer_tpu.train.run \
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

# --- 6: spare — wide end of the force2 curve ------------------------------
stage decode_b256_force2 4800 env VTX_DB_BATCH=256 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=force2 python tools/decode_bench.py

log "round-4c drive complete"
