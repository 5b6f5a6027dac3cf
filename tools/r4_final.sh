#!/bin/bash
# Round-4 finishing chain, run once the walker launch gate landed:
#   A. fresh-tree re-bench campaign (tools/rebench_r4.sh, marker-gated)
#   B. privileged DAgger (VERDICT #4: the learned privileged agent
#      collapses in NoCrash traffic; fork-expert on-policy labels are
#      the written-but-never-run fix) + its NoCrash/Full rows
# Serial on purpose: one TPU chip, and two concurrent compiles contend.
set -u
cd /root/repo
. tools/tpu_probe.sh

stamp() { echo "[r4final $(date +%H:%M:%S)] $*"; }

# ---- A. re-bench campaign on the gated engine ----
bash tools/rebench_r4.sh

# ---- B. privileged DAgger ----
TEACHER=ckpts/priv_full/priv/model-32
if [ ! -f /tmp/r4f.privd.done ]; then
  probe_tpu || { stamp "TPU dead before priv-dagger"; exit 1; }
  stamp "priv DAgger (fork-expert labels, device buffer, mixed traffic)"
  python -m lbc_tpu.cli.train_priv_dagger \
    --ckpt "$TEACHER" \
    --log_dir ckpts/priv_dagger_r4 \
    --episodes 20 --episode_length 1000 --n_envs 4 \
    --n_vehicles 20 --n_pedestrians 50 \
    --epochs_per_episode 3 --batches_per_epoch 100 --batch_size 256 \
    --mix-dense \
    || { stamp "priv dagger FAILED"; exit 1; }
  touch /tmp/r4f.privd.done
fi
PRIVD=$(python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_checkpoint
print(latest_checkpoint('ckpts/priv_dagger_r4') or '')
PYEOF
)
stamp "priv-dagger checkpoint: $PRIVD"
if [ -n "$PRIVD" ] && [ ! -f /tmp/r4f.privd.committed ]; then
  bash tools/commit_artifact.sh \
    "Commit the round-4 privileged-DAgger checkpoint" \
    "$PRIVD" ckpts/priv_dagger_r4/config.json \
    && touch /tmp/r4f.privd.committed
fi

if [ -n "$PRIVD" ] && [ ! -f /tmp/r4f.privbench.done ]; then
  for s in NoCrashTown01-v3 NoCrashTown01-v4 NoCrashTown02-v3 \
           NoCrashTown02-v4 NoCrashTown01-v5 NoCrashTown01-v6 \
           NoCrashTown02-v5 NoCrashTown02-v6 \
           FullTown01-v3 FullTown01-v4 FullTown02-v3 FullTown02-v4; do
    python -m lbc_tpu.cli.benchmark_agent --suite "$s" --seed 0 \
      --log-dir benchmark_results/r4fix/privd --model-path "$PRIVD" \
      2>&1 | tail -n 20
  done
  touch /tmp/r4f.privbench.done
  git add benchmark_results/r4fix
  git commit -q -m "Privileged-DAgger benchmark rows (gated engine, fresh tree)" || true
fi

stamp "chain complete"
