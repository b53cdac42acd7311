#!/usr/bin/env bash
# Raw-JVM launcher for graft mains: no sbt project-lock contention, the
# round-11 decade heap (96g), the JDK17 add-opens set. Compile first
# (sbt compile); then: tools/run_main.sh <MainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${SPARK_DRIVER_MEM:-96g}" $ADDOPENS \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
