#!/usr/bin/env bash
# Repo-local bench sweep. Exports SPARK_GRAFT_BENCH_KIND=local so the
# cross-round regression flags diff against the LOCAL artifact series
# (BENCH_r*_local.json) — like-for-like, never against the driver
# harness's BENCH_r*.json (a different environment; see Bench.scala's
# prior-selection comment).
#
# Usage: tools/bench_local.sh [sf_dir]   # default /root/testdata/sf0.1
set -euo pipefail
export SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.1}"
export SPARK_GRAFT_BENCH_KIND=local
exec sbt -batch "runMain graft.Bench"
