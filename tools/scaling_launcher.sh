#!/bin/bash
# Probe-gated scaling-run launcher: polls the calibration probe (plain
# JVM, no sbt) and fires one ScalingBench run the moment the host looks
# quiet. Usage: scaling_launcher.sh <runTag> [maxProbes] [sleepSec]
set -u
TAG="${1:?run tag, e.g. runC}"
MAX="${2:-40}"
SLEEP="${3:-90}"
N="${4:-2}"
N4="${5:-8}"
cd /root/repo
for i in $(seq 1 "$MAX"); do
  OUT=$(java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.CalibrationProbe 3 2>/dev/null)
  echo "[launcher] probe $i: $OUT"
  if echo "$OUT" | grep -q '"ok":true'; then
    echo "[launcher] quiet window detected - launching ScalingBench $TAG"
    SPARK_DRIVER_MEM=48g sbt -batch \
      "runMain graft.ScalingBench 960000 $N $N4 SCALING_r08_$TAG.json" \
      > "target/scaling_r08_$TAG.log" 2>&1
    echo "[launcher] run $TAG complete:"
    cat "SCALING_r08_$TAG.json" 2>/dev/null
    exit 0
  fi
  sleep "$SLEEP"
done
echo "[launcher] no quiet window in $MAX probes - giving up"
exit 3
