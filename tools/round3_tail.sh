#!/bin/bash
# Round-3 TPU queue after phase-1 (tools/round3_phase01.sh):
#   1. Stage-1 benchmarks (Full v1-v4 both towns)
#   2. DAgger phase 2 at scale (device-resident buffer)
#   3. Stage-2 benchmarks (Full + NoCrash matrix)
# Stages are resumable via marker files under /tmp/r3tail.*; benchmark
# runs themselves resume row-by-row (bench/runner.py).
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r3tail $(date +%H:%M:%S)] $*"; }

PHASE1=${PHASE1:-$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/image_r3b/phase1'))
PYEOF
)}
PHASE2_DIR=${PHASE2_DIR:-ckpts/image_r3b/phase2}
STAGE1_DIR=${STAGE1_DIR:-benchmark_results/stage1_r3b}
STAGE2_DIR=${STAGE2_DIR:-benchmark_results/stage2_r3b}
stamp "stage-1 checkpoint: $PHASE1"
[ -z "$PHASE1" -o "$PHASE1" = "None" ] && { stamp "no phase-1 ckpt"; exit 1; }
TEACHER=${TEACHER:-$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_full/priv') or '')
PYEOF
)}
stamp "privileged teacher: $TEACHER"
[ -z "$TEACHER" ] && { stamp "no privileged teacher"; exit 1; }

if [ ! -f /tmp/r3tail.stage1.done ]; then
  for s in FullTown01-v1 FullTown01-v2 FullTown01-v3 FullTown01-v4 \
           FullTown02-v1 FullTown02-v2 FullTown02-v3 FullTown02-v4 \
           StraightTown01-v1 StraightTown01-v2 TurnTown01-v1 TurnTown01-v2 \
           StraightTown02-v1 StraightTown02-v2 TurnTown02-v1 TurnTown02-v2; do
    stamp "stage-1 bench $s"
    python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
      --suite "$s" --model-path "$PHASE1" \
      --log-dir "$STAGE1_DIR" \
      || { stamp "stage-1 $s FAILED"; exit 1; }
  done
  touch /tmp/r3tail.stage1.done
fi

# ---- expert re-bench (trimmed): claim the collision fixes early ----
if [ ! -f /tmp/r3tail.expert.done ]; then
  for s in NoCrashTown01-v3 NoCrashTown02-v3 NoCrashTown01-v5 \
           NoCrashTown02-v5; do
    stamp "expert bench $s"
    python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
      --suite "$s" --autopilot \
      --log-dir benchmark_results/expert_r3 \
      || { stamp "expert $s FAILED"; exit 1; }
  done
  touch /tmp/r3tail.expert.done
fi

if [ ! -f /tmp/r3tail.dagger.done ]; then
  stamp "DAgger stage 2 (20 episodes, dense Town01, device buffer)"
  python -m lbc_tpu.cli.train_dagger \
    --teacher-path "$TEACHER" \
    --ckpt "$PHASE1" --log_dir "$PHASE2_DIR" \
    --episodes 20 --episode_length 1000 \
    --epochs_per_episode 5 --batches_per_epoch 100 --batch_size 64 \
    --capacity 40000 \
    --device-buffer || { stamp "dagger FAILED"; exit 1; }
  touch /tmp/r3tail.dagger.done
fi

PHASE2=$(python - <<PYEOF
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('$PHASE2_DIR'))
PYEOF
)
stamp "stage-2 checkpoint: $PHASE2"
if [ ! -f /tmp/r3tail.stage2.done ] && [ -n "$PHASE2" ] && [ "$PHASE2" != "None" ]; then
  for s in FullTown01-v3 FullTown01-v4 FullTown02-v3 FullTown02-v4 \
           FullTown01-v1 FullTown01-v2 FullTown02-v1 FullTown02-v2 \
           NoCrashTown01-v1 NoCrashTown01-v2 NoCrashTown01-v3 \
           NoCrashTown01-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
           NoCrashTown02-v1 NoCrashTown02-v2 NoCrashTown02-v3 \
           NoCrashTown02-v4 NoCrashTown02-v5 NoCrashTown02-v6; do
    stamp "stage-2 bench $s"
    python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
      --suite "$s" --model-path "$PHASE2" \
      --log-dir "$STAGE2_DIR" \
      || { stamp "stage-2 $s FAILED"; exit 1; }
  done
  touch /tmp/r3tail.stage2.done
fi

# ---- stage-1 NoCrash rows (deferred below stage-2: lower priority) ----
if [ ! -f /tmp/r3tail.stage1nc.done ]; then
  for s in NoCrashTown01-v1 NoCrashTown01-v2 NoCrashTown01-v3 \
           NoCrashTown01-v4 NoCrashTown02-v1 NoCrashTown02-v2 \
           NoCrashTown02-v3 NoCrashTown02-v4; do
    stamp "stage-1 NoCrash bench $s"
    python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
      --suite "$s" --model-path "$PHASE1" \
      --log-dir "$STAGE1_DIR" \
      || { stamp "stage-1 $s FAILED"; exit 1; }
  done
  touch /tmp/r3tail.stage1nc.done
fi

# ---- privileged-agent DAgger: close the NoCrash traffic gap ----
if [ ! -f /tmp/r3tail.privdagger.done ]; then
  stamp "priv DAgger (fork-expert labels, device buffer, regular traffic)"
  python -m lbc_tpu.cli.train_priv_dagger \
    --ckpt "$TEACHER" \
    --log_dir ckpts/priv_dagger_r3 \
    --episodes 20 --episode_length 1000 --n_envs 4 \
    --n_vehicles 20 --n_pedestrians 50 \
    --epochs_per_episode 3 --batches_per_epoch 100 --batch_size 256 \
    --mix-dense \
    || { stamp "priv dagger FAILED"; exit 1; }
  touch /tmp/r3tail.privdagger.done
fi

PRIVD=$(python - <<'EOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_dagger_r3'))
EOF
)
stamp "priv-dagger checkpoint: $PRIVD"
if [ ! -f /tmp/r3tail.privbench.done ] && [ -n "$PRIVD" ] && [ "$PRIVD" != "None" ]; then
  for s in NoCrashTown01-v3 NoCrashTown01-v4 NoCrashTown02-v3 \
           NoCrashTown02-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
           NoCrashTown02-v5 NoCrashTown02-v6 \
           FullTown01-v3 FullTown01-v4 FullTown02-v3 FullTown02-v4; do
    stamp "priv-dagger bench $s"
    python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
      --suite "$s" --model-path "$PRIVD" \
      --log-dir benchmark_results/priv_dagger_r3 \
      || { stamp "priv-dagger $s FAILED"; exit 1; }
  done
  touch /tmp/r3tail.privbench.done
fi

# ---- multi-seed protocol: seeds 1,2 on the stage-2 NoCrash rows ----
# (reference publishes NoCrash as mean +/- std over seeds 0,1,2;
#  view_benchmark_results.py:29-35)
if [ ! -f /tmp/r3tail.seeds.done ] && [ -n "$PHASE2" ] && [ "$PHASE2" != "None" ]; then
  for seed in 1 2; do
    for s in NoCrashTown01-v1 NoCrashTown01-v2 NoCrashTown01-v3 \
             NoCrashTown01-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
             NoCrashTown02-v1 NoCrashTown02-v2 NoCrashTown02-v3 \
             NoCrashTown02-v4 NoCrashTown02-v5 NoCrashTown02-v6; do
      stamp "stage-2 bench $s seed $seed"
      python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed "$seed" \
        --suite "$s" --model-path "$PHASE2" \
        --log-dir "$STAGE2_DIR" \
        || { stamp "stage-2 $s seed $seed FAILED"; exit 1; }
    done
  done
  touch /tmp/r3tail.seeds.done
fi
stamp "DONE"
