#!/bin/bash
# Launch a graft main class on the already-compiled classes directly —
# sbt's compile/JVM startup burst otherwise lands in the 1-minute
# loadavg right before the tool stamps loadavg_start, making a genuinely
# idle capture read as contaminated. Run `sbt -batch compile` first.
#
# Usage: tools/run_timed.sh <mainClass> [args...]
# Env:   XMX (default 8g), plus whatever the main reads
#        (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_QUERIES, ...).
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
# XMS pre-commits the heap (-Xms -XX:+AlwaysPreTouch) — the fleet-
# standard -Xms=-Xmx shape; used to separate first-pass heap-growth/
# page-commitment cost from JIT in cold-vs-warm attribution probes.
XMSOPT=""
if [ -n "${XMS:-}" ]; then XMSOPT="-Xms$XMS -XX:+AlwaysPreTouch"; fi
# pre-JVM loadavg: AlwaysPreTouch zeroes the whole heap with a
# multi-thread burst BEFORE main runs, so an in-JVM loadavg_start
# stamp partly reads our own pre-touch. Capture the truth here and
# pass it through; graft.Bench prefers it for its stamp + dirty flag.
export GRAFT_PREJVM_LOADAVG="$(cut -d' ' -f1-3 /proc/loadavg | tr ' ' ',')"
exec java -Xmx"${XMX:-8g}" $XMSOPT $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
