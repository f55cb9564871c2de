#!/bin/bash
# Run a graft main class directly against compiled classes + Spark jars
# (bypasses the sbt lock). Usage: run_main.sh <MainClass> [args...]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# exported: local-cluster masters launch executor JVMs through
# SPARK_HOME's worker machinery, and the launcher needs the Scala
# version hint when run outside sbt ("Cannot find any build
# directories" otherwise)
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
CLASSES="$(ls -d "$REPO"/target/scala-*/classes 2>/dev/null | head -1)"
CP="${CLASSES:-$REPO/target/scala-2.13/classes}:$(ls "$SPARK_HOME"/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Xms = Xmx + AlwaysPreTouch: same rationale as build.sbt's javaOptions
# (pre-fault the heap once at startup; heap regrowth otherwise causes
# episodic kernel-time fault storms in 32-thread phases). The pair makes
# the JVM COMMIT the whole heap at startup — on a host that cannot give
# ${SPARK_DRIVER_MEM:-8g} the launch fails where a lazy heap would have
# run, so GRAFT_NO_PRETOUCH=1 opts out (mirroring build.sbt's Test-scope
# filter); small hosts should set SPARK_DRIVER_MEM down instead when
# they want the timing fidelity.
if [ -n "$GRAFT_NO_PRETOUCH" ]; then
  PRETOUCH=""
else
  PRETOUCH="-Xms${SPARK_DRIVER_MEM:-8g} -XX:+AlwaysPreTouch"
fi
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} $PRETOUCH \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
