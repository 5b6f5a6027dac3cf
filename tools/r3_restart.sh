#!/bin/bash
# Round-3 cold-restart master. The 2026-08-18 VM reimage wiped the
# untracked ckpts/ tree (privileged dataset, teacher, RGB dataset, all
# image students), so the whole chain has to be rebuilt. Every stage is
# idempotent — this script can be killed and relaunched at any point
# (tools/r3_watchdog.sh does exactly that, RELAUNCH=tools/r3_restart.sh):
#   A. privileged dataset + teacher      (tools/full_pipeline.py, resumes)
#   B. RGB dataset + phase-0/1 + tail    (tools/round3b.sh, resumes)
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[r3restart $(date +%H:%M:%S)] $*"; }

. tools/tpu_probe.sh

# ---- A. privileged dataset + teacher --------------------------------
# Teacher done = a model-32 (or later) checkpoint under priv_full/priv.
teacher_epoch() {
  python - <<'PYEOF'
from lbc_tpu.train.checkpoints import latest_epoch
print(latest_epoch('ckpts/priv_full/priv'))
PYEOF
}
ep=$(teacher_epoch)
# a failed probe must force the rebuild path, not silently skip it
case "$ep" in ''|*[!0-9-]*) ep=-1;; esac
if [ "$ep" -lt 32 ]; then
  flags=""
  n_data=$(ls ckpts/priv_full/data 2>/dev/null | wc -l)
  # 112 train episodes expected (40 dense + 40 regular + 32 empty);
  # gate on the full count: the empty tranche collects last, so a
  # mid-collection crash would otherwise train on a mix-skewed set
  if [ "$n_data" -ge 112 ] && [ "$(ls ckpts/priv_full/data_val 2>/dev/null | wc -l)" -ge 8 ]; then
    flags="--skip-collect"
    stamp "privileged data already on disk ($n_data episodes); training only"
  else
    stamp "collecting privileged dataset from scratch ($n_data episodes so far)"
  fi
  probe_tpu || { stamp "TPU dead"; exit 1; }
  # 32 epochs: round-2's deployed teacher was model-32 (val L1 0.017);
  # SAVE_EPOCHS is exponential so model-32 is the final checkpoint.
  python tools/full_pipeline.py --epochs 32 $flags \
    || { stamp "full_pipeline FAILED"; exit 1; }
else
  stamp "teacher already trained (epoch $ep)"
fi

# ---- B. the round-3b image chain ------------------------------------
stamp "chaining into round3b"
exec bash tools/round3b.sh
