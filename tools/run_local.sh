#!/usr/bin/env bash
# Run a graft main class against the already-compiled classes WITHOUT
# sbt — local iteration (e.g. while an sbt test run holds the project
# lock). Mirrors build.sbt's javaOptions (JDK17 add-opens, UTC, no UI).
#   tools/run_local.sh graft.Verify /root/testdata/sf0.001 /tmp/out q143_ann_ivf_pq
set -euo pipefail
CLS=$1; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$CLS" "$@"
