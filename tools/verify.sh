#!/bin/bash
# Run Verify at a given sf, then check oracles locally.
set -e
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_out}"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" sbt --error "runMain graft.Verify $SF $OUT"
python3 tools/check.py "$SF" "$OUT" "${@:3}"
