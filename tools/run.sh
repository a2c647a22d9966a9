#!/bin/bash
# Fast runner: java -cp against compiled classes (skips sbt startup).
# Usage: tools/run.sh <MainClass> [args...]   e.g. tools/run.sh graft.Verify /root/testdata/sf0.001 /tmp/verify_out
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*:$HOME/.ivy2/cache/org.scalatest/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
MAIN="$1"; shift
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$MAIN" "$@"
