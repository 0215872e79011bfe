#!/usr/bin/env bash
# Two-cluster-size scaling evidence on a REAL standalone cluster
# (separate executor JVMs), per BASELINE.json north_rule: the same
# wave job submitted at N and 4N executors, trials interleaved.
#
#   ./scripts/standalone_scaling.sh [n_urls] [trials]
#
# Starts a local master + one 32-core worker, submits
# scripts/standalone_wave.py at spark.cores.max=8 (2 executors x 4
# cores) and 32 (8 executors x 4 cores), prints one JSON line per
# trial, then a summary with min-based scaling efficiency.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_URLS="${1:-4000000}"
TRIALS="${2:-2}"
PY="$(command -v python)"
export SPARK_HOME=/opt/spark
export PYSPARK_PYTHON="$PY"
export PYSPARK_DRIVER_PYTHON="$PY"
export SPARK_MASTER_HOST=localhost
export SPARK_LOG_DIR=/tmp/spark-standalone-logs
export SPARK_WORKER_DIR=/tmp/spark-standalone-work

bash "$REPO/scripts/package.sh" >/dev/null

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
"$SPARK_HOME/sbin/start-master.sh" -h localhost -p 7077 >/dev/null
sleep 3
"$SPARK_HOME/sbin/start-worker.sh" spark://localhost:7077 -c 32 -m 80g >/dev/null
sleep 4

run_level() { # $1 = cores.max
  "$SPARK_HOME/bin/spark-submit" --master spark://localhost:7077 \
    --py-files "$REPO/dist/docrawl_spark.zip" \
    --conf spark.cores.max="$1" \
    --conf spark.executor.cores=4 \
    --conf spark.executor.memory=7g \
    --conf spark.pyspark.python="$PY" \
    --conf spark.sql.adaptive.enabled=true \
    "$REPO/scripts/standalone_wave.py" --n-urls "$N_URLS" 2>/dev/null \
    | grep '^{'
}

echo "# interleaved trials: ${TRIALS}x per level, ${N_URLS} urls"
for t in $(seq 1 "$TRIALS"); do
  echo "trial$t cores=8:  $(run_level 8)"
  echo "trial$t cores=32: $(run_level 32)"
done

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
