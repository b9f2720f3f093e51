#!/bin/bash
# Round-5 on-chip drive, phase 1 — the three VERDICT items one queue run
# can close (VERDICT.md round-4 "Next round" #1-#3):
#   1 eval_int8_r3d    int8 quality gate on the SHIPPED r3d checkpoint
#                      (16/16 single + >=7/8 composite must hold) — decides
#                      whether engine.quantize flips to int8 so the
#                      out-of-box config matches every published number
#   2 train_spec_tiny2 converge the round-4 mixed-profile tiny finetune
#                      (stopped at step 800, loss 2.34/acc 0.57; grounded
#                      runs converge to ~0.03) — spec-profile unification
#   3 eval_tiny5_*     both-profile evals of the converged finetune
#   4 train_quality_r5 base rescue from r3d WITH the temporal-reversal
#                      augmentation (c57ee47, landed after the last base
#                      training) at the proven 0.7 composite mix — targets
#                      time_reverse >=14/16 and composite 8/8
#   5 eval_r5 / eval_r5_ood   single+composite and full OOD shift sweep
#
#   bash tools/round5_drive.sh [OUT_DIR] (default data/measurements/r5)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r5}
mkdir -p "$OUT"

log() { echo "[r5 $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

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

DEADLINE=${VTX_QUEUE_DEADLINE:-0}

commit_stage() { # commit_stage NAME
  git add "$OUT" >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round 5)" \
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
R3D=data/checkpoints/base-zh-grounded-r3d-bf16/params_3700

# --- 1: int8 gate on the shipped checkpoint (VERDICT #1a) -----------------
stage eval_int8_r3d 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $R3D --quantize int8 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

# --- 2: converge the mixed-profile tiny finetune (VERDICT #3) -------------
# Round 4 stopped at 800 steps / lr 1e-4 with loss oscillating 1.2-2.7 and
# grad norms 2-9 — unconverged, not diverged. Continue from its last
# checkpoint at a gentler lr with 4x the budget.
stage train_spec_tiny2 7200 python -m video_transformer_tpu.train.run \
  --preset tiny --steps 3000 --batch 8 --text-len 4736 --lr 7e-5 \
  --grounded --grounded-cache 4096 --grounded-composite 0.35 \
  --grounded-band 0.15 \
  --tokenizer $TOK \
  --prompt-profile mixed --prompt-len 3712 \
  --init-from data/checkpoints/tiny-zh-grounded-r4mix \
  --out data/checkpoints/tiny-zh-grounded-r5mix \
  --checkpoint-every 500 --log-dir data/output/logs

if [ -d data/checkpoints/tiny-zh-grounded-r5mix ]; then
  stage eval_tiny5_spec 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset tiny --checkpoint data/checkpoints/tiny-zh-grounded-r5mix \
    --all-checkpoints --prompt-profile spec \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
  stage eval_tiny5_compact 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset tiny --checkpoint data/checkpoints/tiny-zh-grounded-r5mix \
    --all-checkpoints --prompt-profile compact \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
fi

# --- 4: base quality rescue with reversal augmentation (VERDICT #2) -------
# Same regime that produced the shipped 16/16+7/8 checkpoint (0.7 mix,
# lr 7e-5, squeezed band) but now every grounded sample draws the 20%
# temporal-reversal augmentation, and init is the shipped r3d itself.
stage train_quality_r5 10800 python -m video_transformer_tpu.train.run \
  --preset base --steps 400 --batch 8 --text-len 2048 --lr 7e-5 \
  --grounded --grounded-cache 4096 --grounded-composite 0.7 \
  --grounded-band 0.2 \
  --tokenizer $TOK \
  --remat --prompt-profile compact \
  --init-from "$R3D" \
  --out data/checkpoints/base-zh-grounded-r5 \
  --checkpoint-every 200 --log-dir data/output/logs

if [ -d data/checkpoints/base-zh-grounded-r5 ]; then
  stage eval_r5 5400 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5 \
    --all-checkpoints \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
  stage eval_r5_ood 7200 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5 \
    --all-checkpoints --shifts all \
    --tokenizer $TOK --topics 16 --batch 8 || true"
fi

log "round-5 phase-1 drive complete"
