#!/bin/bash
# Run a graft main class outside sbt (same JVM flags as build.sbt's
# forked run) so long measurement jobs don't hold the sbt project lock.
# Usage: tools/java_run.sh <mainClass> [args...]; env vars pass through.
set -eu
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GCLockerRetryAllocationCount: JDK 17 G1 spurious-OOM mitigation —
# see the javaOptions comment in build.sbt (r16 root cause of the
# factor-300 one-pass deaths).
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:+UnlockDiagnosticVMOptions \
  -XX:GCLockerRetryAllocationCount=100 \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
