#!/bin/bash
# Round-5 on-chip drive, phase 3 — consumes phase-1/2 results:
#   1 spec_r5mix_b8     speculative row with the converged r5mix draft at
#                       the proven small-batch point (K=6, b8) — the r4 row
#                       was 1.43x with a STALE 8/16 draft; acceptance
#                       tracks draft quality (verdict Weak #6)
#   2 spec_r5mix_b16k3  K=3 at the bench's fixed batch 16 — verdict #9:
#                       either a captured spec>=plain b16 row or the
#                       closing ablation for this part
#   3 train_attr_r5b    attribute + hard-pair finetune from the phase-1
#                       quality-rescue checkpoint: states visual
#                       attributes (--grounded-attrs) and oversamples
#                       near-hue composite partners (--grounded-hard-pairs,
#                       the 优化器+降维方法 miss)
#   4 eval_r5b / eval_r5b_content  single+composite, content coverage +
#                       attr grounding + rubric on the finetune
#   5 bench_final       official line at the SHIPPED config (bench.py now
#                       reads engine.quantize from config.yaml)
#
#   bash tools/round5_drive3.sh [OUT_DIR] (default data/measurements/r5)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r5}
mkdir -p "$OUT"

log() { echo "[r5c $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

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
log "tunnel UP (phase 3)"

DEADLINE=${VTX_QUEUE_DEADLINE:-0}

commit_stage() {
  git add "$OUT" data/output/stream_bench_runs.jsonl \
    data/output/decode_bench_runs.jsonl docs/audit_corpus.json \
    >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round 5)" >/dev/null 2>&1 || true
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
R5BF=data/checkpoints/base-zh-grounded-r5-bf16/params_4100
DRAFT=data/checkpoints/tiny-zh-grounded-r5mix/params_4500
# The quality-rescue output when it exists and scored well; set by hand
# before launching phase 3 if eval_r5 picked a different step.
R5=${VTX_R5_CKPT:-data/checkpoints/base-zh-grounded-r5/params_4100}

# Re-run: the phase-2 attempt failed with HTTP 413 (weights captured as
# jit constants blew the remote compiler's request limit; fixed to pass
# them as arguments). The .done marker was cleared.
stage stream_bench 6000 python tools/stream_bench.py

# splitwrite measured +13% over force2 at b16 (6,970 vs 6,165 tok/s,
# decode_force1_b16); xprog adds the cross-program block-0 prefetch on
# top — the candidate new serving default.
stage decode_xprog_b16 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=xprog python tools/decode_bench.py
stage decode_xprog_b128 4800 env VTX_DB_BATCH=128 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=xprog python tools/decode_bench.py

stage spec_r5mix_b8 4800 env VTX_SPEC_K=6 VTX_SPEC_BATCH=8 \
  VTX_SPEC_CLIPS=16 VTX_SPEC_QUANT=int8 python tools/spec_eval.py \
  --target "$R5BF" --draft "$DRAFT" --tokenizer "$TOK"

stage spec_r5mix_b16k3 4800 env VTX_SPEC_K=3 VTX_SPEC_BATCH=16 \
  VTX_SPEC_CLIPS=16 VTX_SPEC_QUANT=int8 python tools/spec_eval.py \
  --target "$R5BF" --draft "$DRAFT" --tokenizer "$TOK"

INIT=$R5
if [ ! -d "$INIT" ]; then
  log "quality-rescue checkpoint $INIT missing; falling back to r3d"
  INIT=$R3D
fi
stage train_attr_r5b 10800 python -m video_transformer_tpu.train.run \
  --preset base --steps 400 --batch 8 --text-len 2048 --lr 7e-5 \
  --grounded --grounded-cache 4096 --grounded-composite 0.7 \
  --grounded-band 0.2 --grounded-attrs 0.3 --grounded-hard-pairs 0.5 \
  --tokenizer $TOK \
  --remat --prompt-profile compact \
  --init-from "$INIT" \
  --out data/checkpoints/base-zh-grounded-r5b \
  --checkpoint-every 200 --log-dir data/output/logs

if [ -d data/checkpoints/base-zh-grounded-r5b ]; then
  stage eval_r5b 5400 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5b \
    --all-checkpoints \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
  stage eval_r5b_ood 7200 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5b \
    --all-checkpoints --shifts time_reverse \
    --tokenizer $TOK --topics 16 --batch 8 || true"
  stage eval_r5b_content 5400 bash -c "python -m video_transformer_tpu.train.eval_content \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5b/params_4500 \
    --tokenizer $TOK --topics 16 --batch 8 --attrs 16 \
    --coverage-floor 0 || true"
fi

# On-chip quality parity for the split-write + cross-program-prefetch
# kernel path: same checkpoint/seed as the phase-1 int8 gate — per-topic
# results must match it exactly before the path can become a default.
# int8 gate on the NEW shipped checkpoint (r5): quantize flips only if
# this holds 16/16 + 8/8 (or matches the bf16 seed behavior from the
# phase-2 disambiguation).
stage eval_int8_r5 3600 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $R5BF --quantize int8 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

stage eval_xprog_parity 3600 bash -c "env VTX_SPLIT_WRITE=1 VTX_XPROG_PREFETCH=1 \
  python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $R5BF --quantize int8 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

stage bench_final 6000 python bench.py

# Official line with the split-write + prefetch kernel path: if the
# parity gate above holds and this wins, the path becomes the default
# and this row is its first official capture.
stage bench_final_split 6000 env VTX_SPLIT_WRITE=1 VTX_XPROG_PREFETCH=1 \
  python bench.py

log "round-5 phase-3 drive complete"
