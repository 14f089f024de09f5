#!/bin/bash
# Two-cluster-size scaling evidence (BASELINE.json north rule; SURVEY.md §6).
# No real cluster exists in this sandbox, so the same encode job runs via
# spark-submit at --master local[8] and local[32] on the SAME prepared
# input; efficiency = (t8/t32)/4, target >= 0.8.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
REPL="${GRAFT_BENCH_REPL:-200}"
MEM="${SPARK_DRIVER_MEM:-48g}"
OUT="${1:-/tmp/graft-scaling.jsonl}"

sbt -batch package >/dev/null
JAR="target/scala-2.13/ebenezerspark_2.13-0.1.0.jar"

: > "$OUT"
for CPUS in 8 32; do
  echo "== local[$CPUS] =="
  /opt/spark/bin/spark-submit \
    --master "local[$CPUS]" \
    --driver-memory "$MEM" \
    --conf spark.sql.shuffle.partitions="$CPUS" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    --class graft.tools.EncodeBench "$JAR" "$SF" "$REPL" 2>/dev/null \
    | grep '^GRAFT_BENCH_JSON' | sed 's/^GRAFT_BENCH_JSON //' | tee -a "$OUT"
done

python3 - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {r["parallelism"]: r for r in rows}
t8, t32 = by[8]["tokens_per_sec"], by[32]["tokens_per_sec"]
speedup = t32 / t8
eff = speedup / 4.0
print(json.dumps({
    "tokens_per_sec_8": t8, "tokens_per_sec_32": t32,
    "speedup_8_to_32": round(speedup, 3),
    "scaling_efficiency": round(eff, 3),
    "target": 0.8, "pass": eff >= 0.8,
}))
EOF
