#!/bin/bash
# Round-4 TPU queue after phase-1, ordered by value-per-TPU-hour against
# VERDICT.md's list:
#   1. stage-1 core matrix (Full v1-v4 both towns)       [VERDICT #2]
#   2. DAgger phase 2 -> stage-2 core matrix             [VERDICT #3]
#   3. expert new-weather rows v2/v4/v6 both towns       [VERDICT #5]
#   4. privileged DAgger -> NoCrash re-bench             [VERDICT #4]
#   5. stage-1 NoCrash + CoRL straight/turn rows
#   6. expert post-fix re-bench v3/v5 + multi-seed
# Stages are resumable via /tmp/r4tail.* markers; benchmark runs resume
# row-by-row (bench/runner.py); results are committed after each stage.
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r4tail $(date +%H:%M:%S)] $*"; }

PHASE1=${PHASE1:?}
TEACHER=${TEACHER:?}
PHASE2_DIR=${PHASE2_DIR:-ckpts/image_r4/phase2}
STAGE1_DIR=${STAGE1_DIR:-benchmark_results/stage1_r4}
STAGE2_DIR=${STAGE2_DIR:-benchmark_results/stage2_r4}

bench() {  # bench <log-dir> <suite> [extra args...]
  local dir="$1" suite="$2"; shift 2
  stamp "bench $suite -> $dir"
  python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed 0 \
    --suite "$suite" --log-dir "$dir" "$@" \
    || { stamp "bench $suite FAILED"; exit 1; }
}

# ---- 0. perf accounting (VERDICT #6): one bench + stage breakdown ----
# This is the round's only guaranteed-exclusive TPU window (between
# phase-1 and the benchmark queue), so the numbers are committed as the
# canonical uncontended measurement: the driver's end-of-round bench can
# race a still-running tail stage on this 1-core host (that contention
# is what produced BENCH_r03's 11.6% "regression").
if [ ! -f /tmp/r4tail.profile.done ]; then
  stamp "bench.py + profile_breakdown (regression accounting)"
  mkdir -p benchmark_results/perf_r4
  python bench.py 2>&1 | tee /tmp/r4_bench.log
  python tools/profile_breakdown.py --steps 100 2>&1 \
    | tee /tmp/r4_profile.log
  # batch-size frontier: is 1024 leaving the chip underfed?
  python bench.py --batch 2048 --steps 250 2>&1 | tee /tmp/r4_bench2048.log
  cp /tmp/r4_bench.log /tmp/r4_profile.log /tmp/r4_bench2048.log \
     benchmark_results/perf_r4/
  touch /tmp/r4tail.profile.done
  bash tools/commit_artifact.sh \
    "Uncontended perf accounting: bench + stage breakdown + batch frontier" \
    benchmark_results/perf_r4
fi

# ---- 1. stage-1 core matrix ----
if [ ! -f /tmp/r4tail.stage1.done ]; then
  for s in FullTown01-v1 FullTown01-v2 FullTown01-v3 FullTown01-v4 \
           FullTown02-v1 FullTown02-v2 FullTown02-v3 FullTown02-v4; do
    bench "$STAGE1_DIR" "$s" --model-path "$PHASE1"
  done
  touch /tmp/r4tail.stage1.done
  bash tools/commit_artifact.sh "Stage-1 core benchmark rows (round 4)" \
    "$STAGE1_DIR"
fi

# ---- 2a. DAgger phase 2 ----
if [ ! -f /tmp/r4tail.dagger.done ]; then
  stamp "DAgger stage 2 (20 episodes, dense Town01, device buffer)"
  # capacity 40000 = ~7.4 GB HBM (184.5 kB/frame, donated updates); if the
  # chip OOMs anyway, retry once at 24000 (~4.4 GB) instead of letting the
  # watchdog crash-loop this marker-gated stage forever
  dagger_run() {
    python -m lbc_tpu.cli.train_dagger \
      --teacher-path "$TEACHER" \
      --ckpt "$PHASE1" --log_dir "$PHASE2_DIR" \
      --episodes 20 --episode_length 1000 \
      --epochs_per_episode 5 --batches_per_epoch 100 --batch_size 64 \
      --capacity "$1" \
      --device-buffer
  }
  dagger_run 40000 || { stamp "dagger failed at cap 40000; retry at 24000"; \
    dagger_run 24000; } || { stamp "dagger FAILED"; exit 1; }
  touch /tmp/r4tail.dagger.done
fi
PHASE2=$(python - <<PYEOF
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('$PHASE2_DIR') or '')
PYEOF
)
stamp "stage-2 checkpoint: $PHASE2"
if [ -n "$PHASE2" ] && [ ! -f /tmp/r4.stage2.committed ]; then
  bash tools/commit_artifact.sh \
    "Commit the round-4 stage-2 (DAgger) checkpoint" \
    "$PHASE2" "$PHASE2_DIR/config.json" \
    && touch /tmp/r4.stage2.committed
fi

# ---- 2b. stage-2 core matrix ----
if [ ! -f /tmp/r4tail.stage2.done ] && [ -n "$PHASE2" ]; then
  for s in FullTown01-v3 FullTown01-v4 FullTown02-v3 FullTown02-v4 \
           FullTown01-v1 FullTown01-v2 FullTown02-v1 FullTown02-v2 \
           NoCrashTown01-v1 NoCrashTown01-v2 NoCrashTown01-v3 \
           NoCrashTown01-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
           NoCrashTown02-v1 NoCrashTown02-v2 NoCrashTown02-v3 \
           NoCrashTown02-v4 NoCrashTown02-v5 NoCrashTown02-v6; do
    bench "$STAGE2_DIR" "$s" --model-path "$PHASE2"
  done
  touch /tmp/r4tail.stage2.done
  bash tools/commit_artifact.sh "Stage-2 benchmark matrix (round 4)" \
    "$STAGE2_DIR"
fi

# ---- 3. expert new-weather rows (never benched in any round) ----
if [ ! -f /tmp/r4tail.expertnw.done ]; then
  for s in NoCrashTown01-v2 NoCrashTown01-v4 NoCrashTown01-v6 \
           NoCrashTown02-v2 NoCrashTown02-v4 NoCrashTown02-v6; do
    bench benchmark_results/expert_r4 "$s" --autopilot
  done
  touch /tmp/r4tail.expertnw.done
  bash tools/commit_artifact.sh "Expert NoCrash new-weather rows (round 4)" \
    benchmark_results/expert_r4
fi

# ---- 4a. privileged DAgger ----
if [ ! -f /tmp/r4tail.privdagger.done ]; then
  stamp "priv DAgger (fork-expert labels, device buffer, mixed traffic)"
  python -m lbc_tpu.cli.train_priv_dagger \
    --ckpt "$TEACHER" \
    --log_dir ckpts/priv_dagger_r4 \
    --episodes 20 --episode_length 1000 --n_envs 4 \
    --n_vehicles 20 --n_pedestrians 50 \
    --epochs_per_episode 3 --batches_per_epoch 100 --batch_size 256 \
    --mix-dense \
    || { stamp "priv dagger FAILED"; exit 1; }
  touch /tmp/r4tail.privdagger.done
fi
PRIVD=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_dagger_r4') or '')
PYEOF
)
stamp "priv-dagger checkpoint: $PRIVD"
if [ -n "$PRIVD" ] && [ ! -f /tmp/r4.privd.committed ]; then
  bash tools/commit_artifact.sh \
    "Commit the round-4 privileged-DAgger checkpoint" \
    "$PRIVD" ckpts/priv_dagger_r4/config.json \
    && touch /tmp/r4.privd.committed
fi

# ---- 4b. privileged-DAgger NoCrash/Full bench ----
if [ ! -f /tmp/r4tail.privbench.done ] && [ -n "$PRIVD" ]; then
  for s in NoCrashTown01-v3 NoCrashTown01-v4 NoCrashTown02-v3 \
           NoCrashTown02-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
           NoCrashTown02-v5 NoCrashTown02-v6 \
           FullTown01-v3 FullTown01-v4 FullTown02-v3 FullTown02-v4; do
    bench benchmark_results/priv_dagger_r4 "$s" --model-path "$PRIVD"
  done
  touch /tmp/r4tail.privbench.done
  bash tools/commit_artifact.sh "Privileged-DAgger benchmark rows (round 4)" \
    benchmark_results/priv_dagger_r4
fi

# ---- 5. stage-1 NoCrash + straight/turn rows ----
if [ ! -f /tmp/r4tail.stage1nc.done ]; then
  for s in NoCrashTown01-v1 NoCrashTown01-v2 NoCrashTown01-v3 \
           NoCrashTown01-v4 NoCrashTown02-v1 NoCrashTown02-v2 \
           NoCrashTown02-v3 NoCrashTown02-v4 \
           StraightTown01-v1 StraightTown01-v2 TurnTown01-v1 TurnTown01-v2 \
           StraightTown02-v1 StraightTown02-v2 TurnTown02-v1 TurnTown02-v2; do
    bench "$STAGE1_DIR" "$s" --model-path "$PHASE1"
  done
  touch /tmp/r4tail.stage1nc.done
  bash tools/commit_artifact.sh "Stage-1 NoCrash + CoRL rows (round 4)" \
    "$STAGE1_DIR"
fi

# ---- 6a. expert post-fix re-bench (r3 hazard/gridlock/headway fixes) ----
if [ ! -f /tmp/r4tail.expertrefix.done ]; then
  for s in NoCrashTown01-v3 NoCrashTown02-v3 NoCrashTown01-v5 \
           NoCrashTown02-v5 NoCrashTown01-v1 NoCrashTown02-v1; do
    bench benchmark_results/expert_r4 "$s" --autopilot
  done
  touch /tmp/r4tail.expertrefix.done
  bash tools/commit_artifact.sh "Expert post-fix NoCrash re-bench (round 4)" \
    benchmark_results/expert_r4
fi

# ---- 6b. multi-seed: stage-2 NoCrash (reference protocol: seeds 0,1,2) ----
if [ ! -f /tmp/r4tail.seeds.done ] && [ -n "$PHASE2" ]; then
  for seed in 1 2; do
    for s in NoCrashTown01-v1 NoCrashTown01-v2 NoCrashTown01-v3 \
             NoCrashTown01-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
             NoCrashTown02-v1 NoCrashTown02-v2 NoCrashTown02-v3 \
             NoCrashTown02-v4 NoCrashTown02-v5 NoCrashTown02-v6; do
      stamp "stage-2 bench $s seed $seed"
      python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed "$seed" \
        --suite "$s" --model-path "$PHASE2" --log-dir "$STAGE2_DIR" \
        || { stamp "stage-2 $s seed $seed FAILED"; exit 1; }
    done
    bash tools/commit_artifact.sh \
      "Stage-2 NoCrash seed-$seed rows (round 4)" "$STAGE2_DIR"
  done
  touch /tmp/r4tail.seeds.done
fi

# ---- 6c. expert multi-seed: new-weather rows + the T02 train-weather
# seeds missing since round 2 (reference protocol: all NoCrash rows are
# mean +/- std over seeds 0,1,2) ----
if [ ! -f /tmp/r4tail.expertseeds.done ]; then
  for seed in 1 2; do
    for s in NoCrashTown01-v2 NoCrashTown01-v4 NoCrashTown01-v6 \
             NoCrashTown02-v2 NoCrashTown02-v4 NoCrashTown02-v6 \
             NoCrashTown02-v1 NoCrashTown02-v3 \
             NoCrashTown01-v1 NoCrashTown01-v3 NoCrashTown01-v5 \
             NoCrashTown02-v5; do
      stamp "expert bench $s seed $seed"
      python -m lbc_tpu.cli.benchmark_agent --batch-size 100 --seed "$seed" \
        --suite "$s" --autopilot --log-dir benchmark_results/expert_r4 \
        || { stamp "expert $s seed $seed FAILED"; exit 1; }
    done
  done
  touch /tmp/r4tail.expertseeds.done
  bash tools/commit_artifact.sh "Expert new-weather seeds 1,2 (round 4)" \
    benchmark_results/expert_r4
fi
stamp "DONE"
