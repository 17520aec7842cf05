#!/usr/bin/env bash
# Package cc_dbp_spark and spark-submit the crawl job with --py-files.
#   tools/submit.sh [--local] <run_crawl.py args...>
# Extra spark-submit flags (master, executors, memory) via SPARK_SUBMIT_OPTS_EXTRA.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/cc_dbp_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" cc_dbp_spark -x '*__pycache__*')

MASTER_ARGS=()
if [[ "${1:-}" == "--local" ]]; then
  shift
  MASTER_ARGS=(--master "local[4]" --conf spark.sql.shuffle.partitions=4)
fi

JOB="$REPO/tools/run_crawl.py"
if [[ "${1:-}" == "--job" ]]; then
  JOB="$REPO/tools/$2"; shift 2
fi

exec spark-submit \
  "${MASTER_ARGS[@]}" \
  ${SPARK_SUBMIT_OPTS_EXTRA:-} \
  --py-files "$ZIP" \
  "$JOB" "$@"
