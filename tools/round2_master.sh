#!/bin/bash
# Round-2 at-scale runs, strictly sequential on the single TPU chip
# (two concurrent TPU compiles contend badly — CLAUDE.md).
#
# Stage 1 (tools/full_pipeline.py) is launched separately; this script
# waits for it, then runs:
#   2. privileged benchmark matrix (CoRL town1/town2 + NoCrash v1-v6)
#   3. RGB collection (TPU probe, CPU fallback)
#   4. image phases 0/1 at scale (teacher = stage-1 privileged ckpt)
#   5. DAgger stage 2
#   6. image + DAgger benchmarks
#   7. expert matrix completion (resume-compatible, runs till killed)
#
# Usage: nohup bash tools/round2_master.sh > /tmp/master.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[master $(date +%H:%M:%S)] $*"; }

# ---- wait for stage 1 ----------------------------------------------------
if [ -f /tmp/priv_full.pid ]; then
  stamp "waiting for full_pipeline (pid $(cat /tmp/priv_full.pid))"
  while kill -0 "$(cat /tmp/priv_full.pid)" 2>/dev/null; do sleep 30; done
fi
grep -q 'DONE' /tmp/priv_full.log || stamp "WARNING: full_pipeline did not print DONE"

PRIV=$(python -c "
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_full/priv'))")
stamp "privileged checkpoint: $PRIV"

BA="python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0"

# ---- 2. privileged benchmark matrix --------------------------------------
# aliases batch suites per invocation: each benchmark_agent process pays
# ~5 min of model-init compile over the tunnel, so 5 invocations, not 16
if [ ! -f /tmp/stage2.done ]; then
  stamp "stage 2: privileged benchmarks"
  for suite in town1 town2 empty regular dense; do
    stamp "  suite $suite"
    $BA --suite "$suite" --model-path "$PRIV"
  done
  touch /tmp/stage2.done
fi

# ---- 3. RGB collection ----------------------------------------------------
if [ ! -d ckpts/image_full/data ] || \
   [ "$(ls ckpts/image_full/data 2>/dev/null | wc -l)" -lt 32 ]; then
  stamp "stage 3: RGB collection on TPU (batched Pallas camera)"
  if ! timeout 7200 python tools/collect_rgb.py --platform tpu \
       --out ckpts/image_full/data; then
    stamp "  TPU camera collect failed — CPU fallback at reduced scale"
    timeout 10800 python tools/collect_rgb.py --platform cpu \
      --episodes-scale 0.25 --out ckpts/image_full/data
  fi
fi

# ---- 4. image phases 0/1 ---------------------------------------------------
if [ ! -f /tmp/stage4.done ]; then
  stamp "stage 4: image phases 0/1"
  python tools/image_pipeline.py --skip-collect \
    --workdir ckpts/image_full --teacher "$PRIV" \
    --phase0-epochs 8 --phase1-epochs 32 --samples 250 --batch 128 \
    --bench-suite StraightTown01-v1
  touch /tmp/stage4.done
fi

PHASE1=$(python -c "
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/image_full/phase1'))")

# ---- 5. DAgger stage 2 -----------------------------------------------------
if [ ! -f /tmp/stage5.done ]; then
  stamp "stage 5: DAgger from $PHASE1"
  python -m lbc_tpu.cli.train_dagger --teacher-path "$PRIV" \
    --ckpt "$PHASE1" --log_dir ckpts/image_full/phase2 \
    --episodes 20 --episode_length 1000
  touch /tmp/stage5.done
fi

PHASE2=$(python -c "
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/image_full/phase2'))")

# ---- 6. image + DAgger benchmarks ------------------------------------------
if [ ! -f /tmp/stage6.done ]; then
  stamp "stage 6: image/DAgger benchmarks ($PHASE2)"
  $BA --suite student-eval --model-path "$PHASE2"
  $BA --suite student-eval --model-path "$PHASE1"
  touch /tmp/stage6.done
fi

# ---- 7. expert matrix (resume-compatible; fills remaining time) -------------
stamp "stage 7: expert matrix"
bash tools/expert_matrix.sh
stamp "ALL STAGES DONE"
