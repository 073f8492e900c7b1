#!/bin/bash
# Run Verify at a given sf, then check oracles locally.
# Extra args restrict BOTH the Spark dump and the DuckDB compare to the
# named queries (dev fast path; the driver always runs the full set).
set -e
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_out}"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" sbt --error "runMain graft.Verify $SF $OUT ${*:3}"
python3 tools/check.py "$SF" "$OUT" "${@:3}"
