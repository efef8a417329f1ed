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
# Round-label integrity (round-18 lesson: the glob staged only files
# present at run time, so the r18 receipts stamped AFTER the script ran
# stayed uncommitted while the commit message claimed the round). When
# a numeric label is given, the round's own driver receipts must exist
# — fail loudly instead of committing a round without its receipts.
if [[ "$LABEL" =~ ^[0-9]+$ ]]; then
  PADDED=$(printf '%02d' "$LABEL")
  for want in "BENCH_r${PADDED}.json" "CORRECTNESS_r${PADDED}.json"; do
    if [ ! -e "$want" ]; then
      echo "MISSING $want: round $LABEL receipts not stamped yet — rerun after the driver writes them" >&2
      exit 1
    fi
  done
fi
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
