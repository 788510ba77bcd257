#!/bin/bash
# Build the --py-files archive for cluster submission (north_rule launch mode):
#
#   ./scripts/package_pyfiles.sh
#   spark-submit --py-files dist/fepoc.zip jobs/run_maintenance.py \
#       --table s3://bucket/tokens --op compact --job-id nightly-$(date +%F)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fepoc.zip
python -m zipfile -c dist/fepoc.zip feature_engineering_poc_spark
python -m zipfile -l dist/fepoc.zip | tail -2
echo "built dist/fepoc.zip"
