#!/bin/bash
# Isolated bench re-measure (BASELINE.md adjudication method): runs
# graft.Bench restricted to SPARK_GRAFT_BENCH_ONLY query lists, one
# batch per invocation, against a FROZEN copy of the compiled classes
# so concurrent sbt compiles don't perturb the run.
# Usage: dev/bench_only.sh "q1,q2,..." [outfile]
set -u
REPO=/root/repo
CLS=/tmp/graft_bench_classes
OUT=${2:-/dev/stdout}
# refresh the frozen snapshot whenever the compiled classes are newer:
# an isolated re-measure against stale bytecode would feed wrong-build
# timings into BASELINE.md adjudications
SRC="$REPO/target/scala-2.13/classes"
if [ ! -d "$CLS" ] || [ -n "$(find "$SRC" -newer "$CLS" -print -quit 2>/dev/null)" ]; then
  rm -rf "$CLS"
  cp -r "$SRC" "$CLS"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd "$REPO"
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_ONLY="$1" \
java $ADD_OPENS -Dfile.encoding=UTF-8 -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench >> "$OUT" 2>/tmp/bench_only_err.log
