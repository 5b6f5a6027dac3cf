#!/bin/bash
# Round-4 master: rebuild the whole artifact chain (the 2026-08-18
# reimages wiped gitignored ckpts/ twice) and land the numbers VERDICT.md
# asks for — stage-1 matrix, stage-2 DAgger, privileged DAgger, expert
# new-weather rows. Idempotent: every stage is marker- or
# checkpoint-gated; tools/r4_watchdog.sh kills wedged TPU jobs by pid and
# relaunches this script.
#
#   A. privileged dataset + teacher  (tools/full_pipeline.py, resumes)
#   A2. force-commit the teacher checkpoint (reimage-proof artifact)
#   B. RGB dataset + phase-0 + phase-1 (deadline-escaped, resumes)
#   B2. force-commit the stage-1 checkpoint
#   C. benchmark/DAgger tail (tools/round4_tail.sh)
set -u
cd "$(dirname "$0")/.."
. tools/tpu_probe.sh
stamp() { echo "[r4 $(date +%H:%M:%S)] $*"; }

TEACHER_DIR=ckpts/priv_full/priv
DATA=ckpts/image_r4/data
P0=ckpts/image_r4/phase0
P1=ckpts/image_r4/phase1
PHASE1_MAX=192

# ---- A. privileged dataset + teacher --------------------------------
teacher_epoch() {
  local ep
  ep=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_epoch
print(latest_epoch('ckpts/priv_full/priv'))
PYEOF
)
  # a failed probe (import error, transient crash) must force the
  # rebuild path, not silently skip it (ADVICE r3, medium)
  case "$ep" in ''|*[!0-9-]*) ep=-1;; esac
  echo "$ep"
}
ep=$(teacher_epoch)
if [ "$ep" -lt 32 ]; then
  flags=""
  n_data=$(ls ckpts/priv_full/data 2>/dev/null | wc -l)
  # 112 train episodes expected (40 dense + 40 regular + 32 empty);
  # gate on the full count so a mid-collection crash re-collects the
  # truncated tranche instead of training on a mix-skewed set
  if [ "$n_data" -ge 112 ] && [ "$(ls ckpts/priv_full/data_val 2>/dev/null | wc -l)" -ge 8 ]; then
    flags="--skip-collect"
    stamp "privileged data already on disk ($n_data episodes); training only"
  else
    stamp "collecting privileged dataset ($n_data/112 episodes so far)"
  fi
  probe_tpu || { stamp "TPU dead"; exit 1; }
  # 32 epochs: the round-2 deployed teacher was model-32 (val L1 0.017)
  python tools/full_pipeline.py --epochs 32 $flags \
    || { stamp "full_pipeline FAILED"; exit 1; }
fi
stamp "teacher ready (epoch $(teacher_epoch))"

# ---- A2. durable teacher artifact ------------------------------------
if [ -d "$TEACHER_DIR/model-32" ] && [ ! -f /tmp/r4.teacher.committed ]; then
  bash tools/commit_artifact.sh \
    "Commit the round-4 privileged teacher checkpoint (model-32)" \
    "$TEACHER_DIR/model-32" ckpts/priv_full/config.json \
    && touch /tmp/r4.teacher.committed
fi
TEACHER=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_full/priv') or '')
PYEOF
)
[ -z "$TEACHER" ] && { stamp "no teacher checkpoint"; exit 1; }
stamp "teacher: $TEACHER"

# ---- B. RGB dataset ---------------------------------------------------
n_rgb=$(ls "$DATA" 2>/dev/null | wc -l)
if [ "$n_rgb" -lt 64 ]; then
  stamp "collecting RGB dataset ($n_rgb/64 episodes so far)"
  probe_tpu || { stamp "TPU dead"; exit 1; }
  python tools/collect_rgb.py --out "$DATA" --platform tpu \
    || { stamp "collect_rgb FAILED"; exit 1; }
fi
stamp "RGB data ready: $(ls $DATA | wc -l) episodes"

# ---- B. phase 0 -------------------------------------------------------
probe_tpu || { stamp "TPU dead"; exit 1; }
if [ ! -d "$P0/model-2" ]; then
  stamp "phase 0"
  python -m lbc_tpu.cli.train_image --phase 0 --resident \
    --dataset_dir "$DATA" --teacher-path "$TEACHER" \
    --log_dir "$P0" \
    --batch_size 96 --max_epoch 2 --samples_per_epoch 1000 \
    --no-augment || { stamp "phase 0 FAILED"; exit 1; }
fi

# ---- B. phase 1, crash-resumable, deadline-escaped --------------------
# /tmp/r4.phase1_deadline (epoch secs) is stamped once at round start:
# past it, any student >=48 epochs cuts straight to the benchmark tail —
# landed numbers on a partly-trained student beat an unbenchmarked
# fully-trained one (round 3 shipped zero rows chasing epoch 256).
while [ ! -d "$P1/model-$PHASE1_MAX" ]; do
  last=$(python - <<'PYEOF'
import os, re
d = 'ckpts/image_r4/phase1'
eps = [int(m.group(1)) for n in (os.listdir(d) if os.path.isdir(d) else [])
       for m in [re.match(r'model-(\d+)$', n)] if m]
print(max(eps) if eps else -1)
PYEOF
)
  deadline=$(cat /tmp/r4.phase1_deadline 2>/dev/null || echo "")
  if [ -n "$deadline" ] && [ "$(date +%s)" -ge "$deadline" ] \
     && [ "$last" -ge 48 ]; then
    stamp "phase-1 deadline passed with model-$last; cutting to tail"
    break
  fi
  probe_tpu || { stamp "TPU dead"; exit 1; }
  if [ "$last" -lt 0 ]; then
    stamp "phase 1 from scratch"
    python -m lbc_tpu.cli.train_image --phase 1 --resident \
      --dataset_dir "$DATA" --teacher-path "$TEACHER" \
      --ckpt "$P0/model-2" --log_dir "$P1" \
      --batch_size 24 --max_epoch "$PHASE1_MAX" --samples_per_epoch 1000 \
      --augment super_hard && continue
    stamp "phase 1 crashed; will resume"
  else
    stamp "phase 1 resume from model-$last"
    python -m lbc_tpu.cli.train_image --phase 1 --resident \
      --dataset_dir "$DATA" --teacher-path "$TEACHER" \
      --ckpt "$P1/model-$last" --epoch-offset "$last" --log_dir "$P1" \
      --batch_size 24 --max_epoch "$PHASE1_MAX" --samples_per_epoch 1000 \
      --augment super_hard && continue
    stamp "phase 1 crashed again; will resume"
  fi
  sleep 60
done
stamp "phase 1 complete"

# ---- B2. durable stage-1 artifact -------------------------------------
PHASE1=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/image_r4/phase1') or '')
PYEOF
)
[ -z "$PHASE1" ] && { stamp "no phase-1 ckpt"; exit 1; }
if [ ! -f /tmp/r4.stage1.committed ]; then
  bash tools/commit_artifact.sh \
    "Commit the round-4 stage-1 image checkpoint ($(basename $PHASE1))" \
    "$PHASE1" ckpts/image_r4/phase1/config.json \
    && touch /tmp/r4.stage1.committed
fi

# ---- C. the benchmark/DAgger tail -------------------------------------
probe_tpu || { stamp "TPU dead"; exit 1; }
stamp "tail with phase-1 checkpoint: $PHASE1"
PHASE1="$PHASE1" TEACHER="$TEACHER" \
  PHASE2_DIR=ckpts/image_r4/phase2 \
  STAGE1_DIR=benchmark_results/stage1_r4 \
  STAGE2_DIR=benchmark_results/stage2_r4 \
  bash tools/round4_tail.sh 2>&1 | tee -a /tmp/r4tail.log
