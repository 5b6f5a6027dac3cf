#!/bin/bash
# Babysit chunked phase-1 training: when a chunk exits (normally or by
# the OOM killer — the tunneled client leaks host mirrors per step),
# relaunch the next chunk after a worker-recovery pause, up to 3 chunks,
# then hand off to tools/round2_tail.sh (DAgger + benchmarks).
#   nohup bash tools/round2_watch.sh > /tmp/watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "[watch $(date +%H:%M:%S)] $*"; }

for i in 1 2 3; do
  while kill -0 "$(cat /tmp/phase1.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
  done
  if grep -q DONE /tmp/phase1.log 2>/dev/null; then
    stamp "phase-1 chunk finished cleanly"
    break
  fi
  stamp "phase-1 chunk died (OOM?) — recovery pause, then next chunk"
  sleep 300
  nohup python tools/phase1_chunk.py \
    --init ckpts/image_full/phase0/model-2 --epochs 8 \
    > /tmp/phase1.log 2>&1 &
  echo $! > /tmp/phase1.pid
done
while kill -0 "$(cat /tmp/phase1.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
stamp "phase-1 done — running tail (DAgger + benchmarks)"
sleep 120
bash tools/round2_tail.sh
stamp "ALL DONE"
