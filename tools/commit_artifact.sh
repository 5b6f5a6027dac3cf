#!/bin/bash
# Commit specific paths from a background pipeline without racing the
# interactive session's git usage: flock-serialized, pathspec-limited
# commit (ignores whatever else is staged). Skips paths over SIZE_CAP to
# keep the repo clonable.
#
#   tools/commit_artifact.sh "message" path [path...]
set -u
cd "$(dirname "$0")/.."
MSG="$1"; shift
# 512 covers a resnet34 TrainState (params + Adam moments) in fp32;
# durable flagship checkpoints are worth the repo weight after two
# reimage wipes
SIZE_CAP_MB=${SIZE_CAP_MB:-512}
paths=()
for p in "$@"; do
  [ -e "$p" ] || { echo "commit_artifact: missing $p, skipping"; continue; }
  mb=$(du -sm "$p" | cut -f1)
  if [ "$mb" -gt "$SIZE_CAP_MB" ]; then
    echo "commit_artifact: $p is ${mb}MB > ${SIZE_CAP_MB}MB cap, skipping"
    continue
  fi
  paths+=("$p")
done
[ ${#paths[@]} -eq 0 ] && { echo "commit_artifact: nothing to commit"; exit 0; }
exec 9>/tmp/lbc_git.lock
flock 9
git add -f -- "${paths[@]}" 2>/dev/null
if git diff --cached --quiet -- "${paths[@]}"; then
  echo "commit_artifact: no changes in ${paths[*]}"
  exit 0
fi
git commit -m "$MSG" -- "${paths[@]}"
