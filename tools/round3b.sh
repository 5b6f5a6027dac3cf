#!/bin/bash
# Round-3b master: after the light-phase fix (opposing approaches share a
# phase; the far-side head now carries the ego's state), the RGB dataset
# is re-collected and the image pipeline re-runs end to end:
#   0. wait for tools/collect_rgb.py (launched separately) to finish
#   1. phase 0 + phase 1 distillation (device-resident), crash-resumable
#   2. chain into tools/round3_tail.sh (stage-1 bench -> DAgger ->
#      stage-2 bench -> priv DAgger -> NoCrash re-bench)
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r3b $(date +%H:%M:%S)] $*"; }

DATA=ckpts/image_r3/data
# Teacher: latest privileged checkpoint (model-32 in both the round-2 and
# the post-reimage rebuilds, but resolve dynamically to survive retrains).
TEACHER=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_full/priv') or '')
PYEOF
)
[ -z "$TEACHER" ] && { stamp "no privileged teacher checkpoint"; exit 1; }
stamp "teacher: $TEACHER"
P0=ckpts/image_r3b/phase0
P1=ckpts/image_r3b/phase1

. tools/tpu_probe.sh

# ---- stage 0: wait for collection ----
while :; do
  pid=$(cat /tmp/r3_collect.pid 2>/dev/null || echo "")
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then sleep 60; continue; fi
  break
done
if ! grep -q "DONE" /tmp/r3_collect.log 2>/dev/null; then
  n=$(ls "$DATA" 2>/dev/null | wc -l)
  stamp "collection process gone without DONE; episodes on disk: $n"
  if [ "$n" -lt 40 ]; then
    stamp "too few episodes; re-running collector"
    probe_tpu || { stamp "TPU dead"; exit 1; }
    python tools/collect_rgb.py --out "$DATA" --platform tpu \
      >> /tmp/r3_collect.log 2>&1 || { stamp "collect FAILED"; exit 1; }
  fi
fi
stamp "collection done: $(ls $DATA | wc -l) episodes"

# ---- stage 1: phase 0 ----
probe_tpu || { stamp "TPU dead"; exit 1; }
if [ ! -d "$P0/model-2" ]; then
  stamp "phase 0"
  python -m lbc_tpu.cli.train_image --phase 0 --resident \
    --dataset_dir "$DATA" --teacher-path "$TEACHER" \
    --log_dir "$P0" \
    --batch_size 96 --max_epoch 2 --samples_per_epoch 1000 \
    --no-augment || { stamp "phase 0 FAILED"; exit 1; }
fi

# ---- stage 2: phase 1, crash-resumable ----
# Deadline escape: with limited round wall-clock left, a benchmarked
# partly-trained student beats an unbenchmarked fully-trained one. The
# floor sits at 64 epochs (not 96/128) because the 2026-08-18 cold
# restart ate most of the round: past the deadline in /tmp/r3.deadline
# (epoch secs), any student >=64 epochs cuts straight to the tail.
while [ ! -d "$P1/model-256" ]; do
  last=$(python - <<'PYEOF'
import os, re
d = 'ckpts/image_r3b/phase1'
eps = [int(m.group(1)) for n in (os.listdir(d) if os.path.isdir(d) else [])
       for m in [re.match(r'model-(\d+)$', n)] if m]
print(max(eps) if eps else -1)
PYEOF
)
  deadline=$(cat /tmp/r3.deadline 2>/dev/null || echo "")
  if [ -n "$deadline" ] && [ "$(date +%s)" -ge "$deadline" ] \
     && [ "$last" -ge 64 ]; then
    stamp "phase-1 deadline passed with model-$last; cutting to tail"
    break
  fi
  probe_tpu || { stamp "TPU dead"; exit 1; }
  if [ "$last" -lt 0 ]; then
    stamp "phase 1 from scratch"
    python -m lbc_tpu.cli.train_image --phase 1 --resident \
      --dataset_dir "$DATA" --teacher-path "$TEACHER" \
      --ckpt "$P0/model-2" --log_dir "$P1" \
      --batch_size 24 --max_epoch 256 --samples_per_epoch 1000 \
      --augment super_hard && continue
    stamp "phase 1 crashed; will resume"
  else
    stamp "phase 1 resume from model-$last"
    python -m lbc_tpu.cli.train_image --phase 1 --resident \
      --dataset_dir "$DATA" --teacher-path "$TEACHER" \
      --ckpt "$P1/model-$last" --epoch-offset "$last" --log_dir "$P1" \
      --batch_size 24 --max_epoch 256 --samples_per_epoch 1000 \
      --augment super_hard && continue
    stamp "phase 1 crashed again; will resume"
  fi
  sleep 60
done
stamp "phase 1 complete"

# ---- stage 3: the benchmark/DAgger tail ----
probe_tpu || { stamp "TPU dead"; exit 1; }
BEST=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/image_r3b/phase1'))
PYEOF
)
[ -d "$P1/model-256" ] && BEST="$P1/model-256"
stamp "tail with phase-1 checkpoint: $BEST"
PHASE1="$BEST" PHASE2_DIR=ckpts/image_r3b/phase2 \
  STAGE1_DIR=benchmark_results/stage1_r3b \
  STAGE2_DIR=benchmark_results/stage2_r3b \
  bash tools/round3_tail.sh 2>&1 | tee /tmp/r3tail_b.log
