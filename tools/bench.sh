#!/bin/bash
# Launch a graft main (default graft.Bench) directly against the compiled
# classes — no sbt overhead, so idle-bench anchors see only Spark's load.
# Usage: SPARK_GRAFT_SF_DIR=... tools/bench.sh [MainClass] [args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MAIN="${1:-graft.Bench}"
shift || true
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
