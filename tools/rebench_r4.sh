#!/bin/bash
# Round-4 re-bench campaign on the conflict-gated engine.
#
# The round-3 dense-suite regression hid for a full round behind
# benchmark resume: re-runs kept stale summary.csv rows from before the
# engine changes. Everything here therefore writes to a FRESH tree
# (benchmark_results/r4fix) that no earlier engine version ever touched;
# resume stays on WITHIN the tree so an interrupted campaign continues
# instead of redoing finished suites.
#
# Stages are marker-gated (idempotent under relaunch) and each commits
# its results + regenerated tables. Priority order: the rows most wrong
# under the old engine first.
set -u
cd /root/repo
LOG=benchmark_results/r4fix
TABLES=benchmark_results/TABLES_r4.md
MARK=/tmp/r4rb
mkdir -p "$LOG"

bench() {  # bench <log-subdir> <suite-or-alias> <seed> <extra args...>
  local sub=$1 suite=$2 seed=$3; shift 3
  python -m lbc_tpu.cli.benchmark_agent --suite "$suite" --seed "$seed" \
    --log-dir "$LOG/$sub" "$@" 2>&1 | tail -n 20
}

tables() {
  {
    echo "# Round-4 benchmark tables (auto-generated)"
    echo
    echo "All rows measured on the conflict-gated engine"
    echo "(tools/rebench_r4.sh) in a fresh tree — no resume-carried rows"
    echo "from earlier engine versions. Success-rate mean ± std over"
    echo "seeds next to the reference's published number (BASELINE.md)."
    echo
    for pair in "$LOG/expert autopilot" "$LOG/stage2 stage2" \
                "$LOG/priv privileged" "$LOG/stage1 stage1" \
                "$LOG/privd privileged"; do
      root=${pair% *}; ref=${pair#* }
      [ -d "$root" ] || continue
      python tools/make_results_tables.py "$root" --reference "$ref" || true
      echo
    done
  } > "$TABLES"
}

stage_done() { [ -f "$MARK.$1" ]; }
finish_stage() {
  touch "$MARK.$1"
  tables
  git add "$LOG" "$TABLES" 2>/dev/null
  git commit -q -m "$2" || true
}

# 1) expert NoCrash, 3 seeds x 12 rows (reference README.md:213-246)
if ! stage_done expert_nocrash; then
  for seed in 0 1 2; do
    for alias in empty regular dense; do
      bench expert "$alias" "$seed" --autopilot
    done
  done
  finish_stage expert_nocrash \
    "Expert NoCrash matrix on the conflict-gated engine (3 seeds, fresh tree)"
fi

# 2) stage-2 image agent: full table (CoRL + NoCrash), 1 seed
if ! stage_done stage2; then
  for alias in all empty regular dense; do
    bench stage2 "$alias" 0 --model-path ckpts/image_r4/phase2/model-19
  done
  finish_stage stage2 \
    "Stage-2 (DAgger) benchmark matrix on the conflict-gated engine"
fi

# 3) learned privileged model-32: NoCrash + CoRL
if ! stage_done priv; then
  for alias in empty regular dense all; do
    bench priv "$alias" 0 --model-path ckpts/priv_full/priv/model-32
  done
  finish_stage priv \
    "Learned-privileged benchmark matrix on the conflict-gated engine"
fi

# 4) expert CoRL rows, seed 0 (README.md:213-246 upper table)
if ! stage_done expert_corl; then
  bench expert all 0 --autopilot
  finish_stage expert_corl \
    "Expert CoRL suite rows on the conflict-gated engine"
fi

# 5) stage-1 image agent: CoRL Full rows
if ! stage_done stage1; then
  bench stage1 all 0 --model-path ckpts/image_r4/phase1/model-192
  finish_stage stage1 \
    "Stage-1 image-agent CoRL rows on the conflict-gated engine"
fi

echo "rebench campaign complete"
