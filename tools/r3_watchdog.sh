#!/bin/bash
# Self-healing babysitter for tools/round3b.sh (phase-0/1 + benchmark tail).
#
# Two rules, checked every 2 min:
#  1. STALENESS: if the pipeline log hasn't been written for STALE_S
#     seconds while a python job is running under round3b, the job is
#     assumed wedged on a dead TPU tunnel RPC (observed: ~60 min futex
#     hang mid-phase-1) and is killed BY PID (never by pattern). round3b's
#     own crash-resume logic then resumes from the last checkpoint /
#     benchmark row.
#  2. RELAUNCH: if round3b itself has exited but the tail hasn't stamped
#     DONE, relaunch it — every stage is idempotent (collection DONE
#     marker, phase-0 dir check, phase-1 checkpoint resume, /tmp/r3tail.*
#     stage markers, row-level benchmark resume).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3b.log
PIDFILE=/tmp/r3b.pid
STALE_S=${STALE_S:-2400}   # 40 min: > worst observed tunnel compile
# What to (re)launch: after the 2026-08-18 reimage wiped ckpts/, the
# idempotent driver is tools/r3_restart.sh (rebuild teacher, then chain
# into round3b.sh). Override with RELAUNCH=tools/round3b.sh if the
# teacher already exists.
RELAUNCH=${RELAUNCH:-tools/r3_restart.sh}
stamp() { echo "[watchdog $(date +%H:%M:%S)] $*"; }

descendants() {  # all descendant pids of $1 (ps by ppid — no patterns)
  local out="" frontier="$1"
  while [ -n "$frontier" ]; do
    local next=""
    for p in $frontier; do
      local kids
      kids=$(ps -o pid= --ppid "$p" 2>/dev/null | tr -d ' ')
      next="$next $kids"
    done
    frontier=$(echo "$next" | xargs 2>/dev/null || true)
    out="$out $frontier"
  done
  echo "$out" | xargs 2>/dev/null || true
}

while :; do
  if grep -q '^\[r3tail .*\] DONE' /tmp/r3tail_b.log 2>/dev/null \
     || grep -q '^\[r3tail .*\] DONE' "$LOG" 2>/dev/null; then
    stamp "tail DONE — watchdog exiting"; exit 0
  fi

  pid=$(cat "$PIDFILE" 2>/dev/null || echo "")
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    # rule 1: staleness kill
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
    if [ "$age" -gt "$STALE_S" ]; then
      kids=$(descendants "$pid")
      if [ -n "$kids" ]; then
        stamp "log stale ${age}s; killing wedged children: $kids"
        kill $kids 2>/dev/null
        sleep 30
        for k in $kids; do kill -9 "$k" 2>/dev/null; done
      else
        stamp "log stale ${age}s but no children (driver sleeping); ok"
      fi
    fi
  else
    # rule 2: relaunch the idempotent driver
    stamp "pipeline not running and tail not DONE — relaunching $RELAUNCH"
    nohup bash "$RELAUNCH" >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    stamp "relaunched as $(cat $PIDFILE)"
    sleep 300   # give it time to probe the TPU before re-checking
  fi
  sleep 120
done
