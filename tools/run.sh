#!/bin/bash
# Fast runner: executes a graft main class directly with java against the
# sbt-compiled classes + unmanaged Spark jars (bypasses sbt startup).
# Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
cd "$(dirname "$0")/.." || exit 1
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens=$p=ALL-UNNAMED"
done
SCALA_LIB=$(ls /root/.sbt/boot/scala-2.13*/lib/scala-library.jar 2>/dev/null | head -1)
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*:$SCALA_LIB" \
  "$@"
