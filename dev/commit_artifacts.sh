#!/bin/bash
# Round-closing artifact commit (judge ask, rounds 14-17: the
# driver-stamped receipts kept floating uncommitted at HEAD).
# Stages every bench/correctness/leakcheck artifact present in the
# repo root and commits them if anything changed. Run as the LAST act
# of a round (after the final Bench refresh), or any time the
# receipts drift from HEAD.
# Usage: dev/commit_artifacts.sh [round-label]
set -u
cd /root/repo
LABEL=${1:-}
FILES=""
for f in BENCH_SELF.json LEAKCHECK.json COPYCHECK.json \
         BENCH_r*.json CORRECTNESS_r*.json; do
  # skip missing files and gitignored ones (COPYCHECK.json is ignored
  # in this tree): an ignored pathspec makes `git commit -- <paths>`
  # fail outright and the receipts silently stay uncommitted
  [ -e "$f" ] || continue
  git check-ignore -q "$f" && continue
  FILES="$FILES $f"
done
[ -z "$FILES" ] && { echo "no artifacts present"; exit 0; }
git add $FILES
if git diff --cached --quiet -- $FILES; then
  echo "artifacts already committed at HEAD"
  exit 0
fi
# pathspec-limited commit: NEVER sweep unrelated pre-staged changes
# into the receipts commit
git commit -m "Commit round${LABEL:+ $LABEL} driver artifacts (bench/correctness receipts)" -- $FILES \
  || { echo "COMMIT FAILED"; exit 1; }
echo "committed:$FILES"
