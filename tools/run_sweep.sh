#!/bin/bash
# Detached run of the reference-shape sweep (graft.SweepRef →
# results/sweep_d1536.csv + .meta.json). Runs from a snapshot of the
# compiled classes so later `sbt compile`s cannot disturb the ~2.5 h
# job, and records the producing commit in the artifact's meta sibling.
# Full run: k-means ~60-70 min (kmeans|| has a long single-threaded
# LocalKMeans phase — 100% one-core CPU is normal), ladder ~80-120 s
# per step, batch phase last. Usage: tools/run_sweep.sh [outCsv]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/sweep_d1536.csv}"
COMMIT=$(git rev-parse HEAD)

# unique snapshot dir + log per launch: deleting/truncating a shared
# path would yank the classpath (NoClassDefFoundError an hour in) or
# the log out from under a still-running sweep. Day-old snapshots are
# reaped so repeated launches don't fill /tmp — but NEVER one still on
# a live JVM's classpath (a >24 h sweep would otherwise lose its
# classes mid-run, the exact failure the snapshot exists to prevent).
for d in /tmp/sweep_classes.*; do
  [ -d "$d" ] || continue
  [ -n "$(find "$d" -maxdepth 0 -mmin +1440)" ] || continue
  pgrep -f "cp $d:" >/dev/null 2>&1 && continue
  rm -rf "$d" "$d.log"
done
sbt -batch compile >/dev/null
SNAP=$(mktemp -d /tmp/sweep_classes.XXXXXX)
cp -r target/scala-2.13/classes/. "$SNAP"
LOG="$SNAP.log"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

setsid nohup env SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SWEEP_COMMIT="$COMMIT" \
  java $ADD_OPENS -Xmx48g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$SNAP:/opt/spark/jars/*" \
  graft.SweepRef "$OUT" \
  > "$LOG" 2>&1 < /dev/null &
echo "sweep launched (commit $COMMIT) — log: $LOG"
