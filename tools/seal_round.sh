#!/bin/bash
# Round-seal: commit the per-round artifacts so judging starts from a
# clean `git status` (VERDICT r17/r18/r19 carried this as a process
# slip three rounds running). Safe to run repeatedly — commits only
# when one of the artifact paths is dirty or untracked.
# Usage: tools/seal_round.sh [message]
set -eu
cd "$(dirname "$0")/.."
MSG="${1:-Record round artifacts}"
PATHS=(BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json \
  bench_detail.json bench_detail_sf1.json SCALING.md \
  rehearse_*_evidence.jsonl)
# expand only paths that exist, skipping gitignored (driver-owned) ones
EXISTING=()
for p in "${PATHS[@]}"; do
  for f in $p; do
    [ -e "$f" ] || continue
    git check-ignore -q "$f" && continue
    EXISTING+=("$f")
  done
done
[ ${#EXISTING[@]} -eq 0 ] && { echo "seal: no artifacts present"; exit 0; }
git add -- "${EXISTING[@]}"
if git diff --cached --quiet; then
  echo "seal: artifacts already committed"
else
  git commit -m "$MSG"
  echo "seal: committed ${#EXISTING[@]} artifact paths"
fi
