#!/bin/bash
# Complete the expert (autopilot) benchmark matrix vs BASELINE.md:
# every NoCrash suite at 3 seeds, CoRL weather-set-4 suites, v7/v8.
# Resume-compatible: already-finished (start,target,weather) rows skip.
set -u
cd "$(dirname "$0")/.."
BA="python -m lbc_tpu.cli.benchmark_agent --autopilot --batch-size 100"

# seed 0 gaps
$BA --seed 0 --suite NoCrashTown01-v2
$BA --seed 0 --suite NoCrashTown01-v4
$BA --seed 0 --suite NoCrashTown01-v6
$BA --seed 0 --suite NoCrashTown02-v2
$BA --seed 0 --suite NoCrashTown02-v4
$BA --seed 0 --suite NoCrashTown02-v6
$BA --seed 0 --suite ntown1p     # NoCrashTown01-v7/v8
$BA --seed 0 --suite ntown2p     # NoCrashTown02-v7/v8
$BA --seed 0 --suite town1p      # FullTown01-v5/v6 + Straight/Turn-v3
$BA --seed 0 --suite town2p

# seeds 1/2: all NoCrash rows the reference reports with ±std
for seed in 1 2; do
  for town in 01 02; do
    for v in v1 v2 v3 v4 v5 v6; do
      $BA --seed $seed --suite NoCrashTown$town-$v
    done
  done
done
echo "[expert_matrix] DONE"
