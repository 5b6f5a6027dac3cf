#!/bin/bash
# Round-3 babysitter: wait for the phase-1 resume to finish; if the TPU
# worker crashed mid-run, resume from the latest checkpoint with the
# matching --epoch-offset; when model-256 exists, probe the TPU and chain
# into tools/round3_tail.sh (stage-1 bench -> DAgger -> stage-2 bench ->
# priv DAgger -> re-bench). Everything logs under /tmp/r3*.log.
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r3watch $(date +%H:%M:%S)] $*"; }

RESUME_PID_FILE=${RESUME_PID_FILE:-/tmp/r3p1_resume.pid}
PHASE1_DIR=ckpts/image_r3/phase1

probe_tpu() {
  # after a worker crash the device wedges 5-20 min; poke until healthy
  for i in $(seq 1 40); do
    if timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128)))
x.block_until_ready()
EOF
    then return 0; fi
    stamp "TPU probe failed ($i), retrying in 60s"; sleep 60
  done
  return 1
}

while [ ! -d "$PHASE1_DIR/model-256" ]; do
  pid=$(cat "$RESUME_PID_FILE" 2>/dev/null || echo "")
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    sleep 60
    continue
  fi
  # trainer died without finishing: find the latest checkpoint and resume
  last=$(python - <<'EOF'
import os, re
d = 'ckpts/image_r3/phase1'
eps = [int(m.group(1)) for n in os.listdir(d)
       for m in [re.match(r'model-(\d+)$', n)] if m]
print(max(eps) if eps else 0)
EOF
)
  stamp "phase-1 trainer dead at epoch <=$last; probing TPU then resuming"
  probe_tpu || { stamp "TPU never recovered"; exit 1; }
  nohup python -m lbc_tpu.cli.train_image --phase 1 --resident \
    --dataset_dir ckpts/image_full/data \
    --teacher-path ckpts/priv_full/priv/model-32 \
    --ckpt "$PHASE1_DIR/model-$last" --epoch-offset "$last" \
    --log_dir "$PHASE1_DIR" \
    --batch_size 24 --max_epoch 256 --samples_per_epoch 1000 \
    --augment super_hard > "/tmp/r3p1_resume_$last.log" 2>&1 &
  echo $! > "$RESUME_PID_FILE"
  stamp "resumed from model-$last (pid $(cat $RESUME_PID_FILE))"
  sleep 120
done

stamp "phase-1 complete (model-256); probing TPU before the tail"
probe_tpu || { stamp "TPU unhealthy"; exit 1; }
stamp "launching round3_tail"
bash tools/round3_tail.sh 2>&1 | tee /tmp/r3tail.log
