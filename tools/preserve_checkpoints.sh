#!/bin/bash
# Insurance against container recycles mid-training (it cost this round a
# full 4.5 h base retrain once — see ROADMAP.md): while the base-r3 run is
# alive, shrink selected params_N checkpoints to bf16 and COMMIT them, and
# commit the final checkpoint the moment training exits — before any eval
# runs. Only committed state survives a recycle; gitignored checkpoints die
# with the container.
#
#   bash tools/preserve_checkpoints.sh TRAIN_PID SRC_DIR DST_DIR [STEPS...]
#
# STEPS are the intermediate snapshot steps (default: 1200 2400); the final
# checkpoint (whatever step training dies at) is always preserved.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

PID=$1
SRC=$2
DST=$3
shift 3
if [ $# -gt 0 ]; then STEPS=("$@"); else STEPS=(1200 2400); fi

log() { echo "[preserve $(date +%H:%M:%S)] $*"; }

# Completed checkpoint steps under SRC, ascending (skips orbax tmp dirs).
completed_steps() {
  for d in "$SRC"/params_*; do
    [ -d "$d" ] || continue
    case "$d" in *orbax-checkpoint-tmp*) continue ;; esac
    echo "${d##*_}"
  done | sort -n
}

# git commit with retry: concurrent session commits hold index.lock briefly.
# Path-limited commit so nothing else staged in the session gets swept in.
commit_path() { # commit_path PATH MESSAGE
  local path=$1 msg=$2 i
  for i in 1 2 3 4 5; do
    if git add -f -- "$path" && git commit -m "$msg" -- "$path"; then
      return 0
    fi
    log "commit retry $i for $path"
    sleep 20
  done
  log "FAILED to commit $path"
  return 1
}

preserve() { # preserve STEP
  local step=$1 src_ckpt="$SRC/params_$1" dst_ckpt
  dst_ckpt="$(pwd)/$DST/params_$1"
  [ -d "$dst_ckpt" ] && return 0
  log "shrinking params_$step -> $DST (bf16)"
  if ! python tools/shrink_checkpoint.py "$src_ckpt" "$dst_ckpt"; then
    log "shrink failed for params_$step"
    return 1
  fi
  commit_path "$DST/params_$step" \
    "Preserve bf16 snapshot of base-r3 step $step (recycle insurance)"
}

mkdir -p "$DST"
pending=("${STEPS[@]}")
while kill -0 "$PID" 2>/dev/null; do
  latest=$(completed_steps | tail -1)
  if [ -n "${latest:-}" ] && [ ${#pending[@]} -gt 0 ]; then
    next=${pending[0]}
    if [ "$latest" -ge "$next" ]; then
      preserve "$latest" && pending=("${pending[@]:1}")
    fi
  fi
  sleep 60
done

log "training pid $PID exited; preserving final checkpoint"
final=$(completed_steps | tail -1)
if [ -n "${final:-}" ]; then
  preserve "$final"
else
  log "no completed checkpoints found under $SRC"
fi
log "done"
