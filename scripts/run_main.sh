#!/bin/bash
# Run a graft main class (graft.Bench / graft.Verify) on the compiled
# classes + /opt/spark/jars directly, WITHOUT sbt — so long probe-scale
# runs don't hold the sbt project lock while specs iterate. Mirrors
# build.sbt's forked-JVM options (JDK17 add-opens, UTC, no UI).
#
#   scripts/run_main.sh graft.Bench
#   scripts/run_main.sh graft.Verify /tmp/graft_probe_k10 /tmp/verify_k10
#
# Env respected: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_* passthrough.
set -euo pipefail
cd "$(dirname "$0")/.."
# Disk-bounding (r11, after the r10 ENOSPC redness): shuffle/spill goes
# to a PINNED directory so a probe session's spill is identifiable and
# reclaimable, and the run refuses to start without headroom — a probe
# that would ENOSPC mid-flight reddens unrelated suites sharing /tmp.
SPARK_LOCAL_DIR="${SPARK_LOCAL_DIR:-/tmp/graft_spark_local}"
mkdir -p "$SPARK_LOCAL_DIR"
FREE_GB=$(df -BG --output=avail "$SPARK_LOCAL_DIR" | tail -1 | tr -dc '0-9')
MIN_FREE_GB="${GRAFT_MIN_FREE_GB:-20}"
if [ "$FREE_GB" -lt "$MIN_FREE_GB" ]; then
  echo "run_main.sh: only ${FREE_GB}G free under $SPARK_LOCAL_DIR" \
       "(need ${MIN_FREE_GB}G; clean spills or set GRAFT_MIN_FREE_GB)" >&2
  exit 2
fi
CLASSES=target/scala-2.13/classes
# test-classes carries the dev-tooling mains (graft.Scratch); absent is
# fine for engine-only runs
TEST_CLASSES=target/scala-2.13/test-classes
[ -d "$CLASSES" ] || { echo "compile first: sbt compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.local.dir="$SPARK_LOCAL_DIR" \
  -cp "$CLASSES:$TEST_CLASSES:/opt/spark/jars/*" "$@"
