#!/bin/bash
# End-of-round-5 finalizer: land whatever the campaign produced, even if
# tools/round5.sh was cut mid-stage (its `finish` commits only run after
# a full stage loop). Idempotent; safe to run any number of times.
#
# Regenerates benchmark_results/TABLES_r5.md from every results tree that
# exists, then commits the benchmark trees + tables. Does NOT touch the
# TPU (tables are pure CSV aggregation).
set -u
cd "$(dirname "$0")/.."

R5=benchmark_results/r5
TABLES=benchmark_results/TABLES_r5.md

{
  echo "# Round-5 benchmark tables (auto-generated)"
  echo
  echo "Every row below was measured on the frozen round-5 engine;"
  echo "bench/runner.py stamps each summary.csv row with the engine"
  echo "fingerprint and quarantines rows from any other engine version"
  echo "(lbc_tpu/utils/fingerprint.py), so stale-resume mixing is"
  echo "mechanically impossible."
  echo
  python - <<'PYEOF'
from lbc_tpu.utils.fingerprint import engine_fingerprint
import subprocess
sha = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                     capture_output=True, text=True).stdout.strip()
print(f'Engine fingerprint: `{engine_fingerprint()}`  (tables generated '
      f'at git `{sha}`)')
PYEOF
  echo
  for pair in "$R5/expert autopilot" "$R5/stage2 stage2" \
              "$R5/stage1 stage1" "$R5/privd privileged" \
              "$R5/teacher privileged"; do
    root=${pair% *}; ref=${pair#* }
    [ -d "$root" ] || continue
    python tools/make_results_tables.py "$root" --reference "$ref" || true
    echo
  done
} > "$TABLES"

git add "$R5" "$TABLES" benchmark_results/perf_r5 2>/dev/null
git diff --cached --quiet || git commit -m "Round-5 final benchmark tables"
git log --oneline -1
