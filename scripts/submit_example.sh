#!/usr/bin/env bash
# Example cluster submission for the engine (round 7, VERDICT r6 #7).
#
# The conf flags are GENERATED from the same executable profile mapping
# the local session uses (dataingestion_pt_ms_spark/session.py:
# cluster_profile_conf), so local runs, this script, and the pytest that
# pins the formulas can never drift apart. Size the profile via env:
#
#   SPARK_GRAFT_EXECUTORS=200 SPARK_GRAFT_EXECUTOR_CORES=8 \
#   SPARK_GRAFT_EXECUTOR_MEM=32g SPARK_GRAFT_SHUFFLE_MULT=3 \
#   SPARK_GRAFT_MAX_PARTITION_BYTES=256m \
#   scripts/submit_example.sh my_job.py --my-arg ...
#
# (200 executors x 8 cores -> spark.sql.shuffle.partitions=4800; AQE
# coalesces small stages down from there at runtime.)
set -euo pipefail

cd "$(dirname "$0")/.."

SUBMIT_CONF=$(python -m dataingestion_pt_ms_spark.session --submit-conf)

# package the engine for the executors; any wheel/zip workflow works,
# a plain zip of the package keeps this container-runnable
PYLIB=$(mktemp -u /tmp/dataingestion_pt_ms_spark.XXXX.zip)
python -c "
import shutil
shutil.make_archive('${PYLIB%.zip}', 'zip', '.', 'dataingestion_pt_ms_spark')
"

exec spark-submit \
  --master "${SPARK_MASTER:-yarn}" \
  --deploy-mode "${SPARK_DEPLOY_MODE:-cluster}" \
  --py-files "$PYLIB" \
  $SUBMIT_CONF \
  "$@"
