#!/usr/bin/env bash
# Package the engine and run a job via spark-submit --py-files (the
# north-rule deployment path). Usage:
#   scripts/package_and_submit.sh <job.py> [job args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:?usage: package_and_submit.sh <job.py> [args...]}"
shift
ZIP="$(mktemp -d)/kgx.zip"
(cd "$REPO" && zip -qr "$ZIP" nlp_lib_spark)
exec spark-submit --py-files "$ZIP" "$JOB" "$@"
