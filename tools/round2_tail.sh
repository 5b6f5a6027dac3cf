#!/bin/bash
# Post-phase-1 sequence: DAgger stage 2 (trimmed to the leak budget),
# then student benchmarks. Run after tools/phase1_chunk.py finishes:
#   nohup bash tools/round2_tail.sh > /tmp/tail.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[tail $(date +%H:%M:%S)] $*"; }

PRIV=ckpts/priv_full/priv/model-32
PHASE1=$(python -c "
import pathlib
from lbc_tpu.train.checkpoints import latest_checkpoint
chunks = sorted(pathlib.Path('ckpts/image_full/phase1').glob('chunk*'))
for c in reversed(chunks):
    ck = latest_checkpoint(c)
    if ck is not None:
        print(ck); break
")
stamp "phase-1 checkpoint: $PHASE1"

if [ ! -f /tmp/tail_dagger.done ]; then
  stamp "DAgger stage 2 (10 episodes, dense Town01)"
  python -m lbc_tpu.cli.train_dagger --teacher-path "$PRIV" \
    --ckpt "$PHASE1" --log_dir ckpts/image_full/phase2 \
    --episodes 10 --episode_length 1000 \
    --epochs_per_episode 3 --batches_per_epoch 60
  touch /tmp/tail_dagger.done
fi

PHASE2=$(python -c "
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/image_full/phase2'))")
stamp "benchmarking phase2 ($PHASE2) on student-eval"
python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
  --suite student-eval --model-path "$PHASE2"
stamp "benchmarking phase1 ($PHASE1) on student-eval"
python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
  --suite student-eval --model-path "$PHASE1"
stamp "DONE"
