#!/bin/bash
# Driver-shaped determinism gate: run Verify at several parallelism
# levels (and once with AQE forced on) over the same SF dir, then diff
# every query's canonical output hash across the runs. Any operator
# whose result varies with partitioning fails here, before the driver's
# correctness compare can catch it red (the t43_mixture_budget class).
#
# Usage: tools/stability.sh [sfDir] [only]
#   sfDir  defaults to /root/testdata/sf0.01
#   only   optional SPARK_GRAFT_ONLY subset, e.g. t43_mixture_budget
#   GRAFT_STABILITY_OUT overrides the matrix out dir (kept in sync
#   with tools/preclose.sh, which reads the cpus32 run's outputs)
set -u
SF_DIR="${1:-/root/testdata/sf0.01}"
ONLY="${2:-}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OUT="${GRAFT_STABILITY_OUT:-/tmp/graft-stability}"
rm -rf "$OUT"; mkdir -p "$OUT"
run() { # $1=tag $2=cpus $3=extra java opts
  echo "== verify $1 (cpus=$2) =="
  SPARK_GRAFT_CPUS="$2" SPARK_GRAFT_ONLY="$ONLY" \
    java $3 -Xmx16g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Verify "$SF_DIR" "$OUT/$1" 2>&1 | grep -v '^2[0-9]' | tail -2
}
run cpus4 4 ""
run cpus8 8 ""
run cpus32 32 ""
run cpus32aqe 32 "-Dspark.sql.adaptive.enabled=true"
python3 tools/stability.py "$OUT"/cpus4 "$OUT"/cpus8 "$OUT"/cpus32 "$OUT"/cpus32aqe
