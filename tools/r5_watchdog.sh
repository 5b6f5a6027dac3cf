#!/bin/bash
# Self-healing babysitter for tools/round5.sh. Two rules, every 2 min:
#  1. STALENESS: log silent >STALE_S while children run -> kill BY PID
#     (never by pattern); round5's checkpoint/marker gating resumes.
#  2. RELAUNCH: driver exited but the tail hasn't stamped DONE -> relaunch.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5.log
PIDFILE=/tmp/r5.pid
STALE_S=${STALE_S:-2400}   # 40 min: > worst observed tunnel compile
RELAUNCH=${RELAUNCH:-tools/round5.sh}
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
  if grep -q '^\[r5 .*\] DONE' "$LOG" 2>/dev/null; then
    stamp "round5 DONE — watchdog exiting"; exit 0
  fi

  pid=$(cat "$PIDFILE" 2>/dev/null || echo "")
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
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
    stamp "driver not running and tail not DONE — relaunching $RELAUNCH"
    nohup bash "$RELAUNCH" >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    stamp "relaunched as $(cat $PIDFILE)"
    sleep 300
  fi
  sleep 120
done
