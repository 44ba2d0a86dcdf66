#!/usr/bin/env bash
# Round-end sf0.1 flag re-verification (one command, see README):
# re-runs the data-dependent-flag queries at sf0.1 and asserts every
# self-verifying boolean flag is TRUE — the check that caught the
# round-5 PQ recall-budget regression, now scripted.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/graft_flags_sf01}"
QUERIES="x_pq_ann,x_minhash_neardup,x_hll_rollup,x_approx_quantile,x_winnow_dedup,x_knn_blocked,x_ivfpq_ann,x_simhash,x_lsh_ann,x_neardedup_incremental,x_semdedup"

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" SPARK_GRAFT_QUERIES="$QUERIES" \
  sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/check_flags.py "$OUT" x_pq_ann x_minhash_neardup x_hll_rollup \
  x_approx_quantile x_winnow_dedup x_knn_blocked x_ivfpq_ann x_simhash x_lsh_ann \
  x_neardedup_incremental
# x_semdedup carries no probabilistic flag (its chain is exact within
# blocks) — its re-proof at sf0.1 is the full DuckDB oracle, which stays
# feasible here because the pair CTE is block-local, not quadratic.
python3 scripts/check.py "$SF" "$OUT" x_semdedup
