#!/usr/bin/env bash
# Submit the mining / curation pipelines to a fixed-size Ray cluster
# via `ray job submit`, and measure the north rule's two-cluster-size
# scaling efficiency (N vs 4N nodes, throughput ratio >= 0.8).
#
# Usage:
#   RAY_DASHBOARD=http://<head>:8265 \
#   INPUT=s3://bucket/transcripts/ OUT=s3://bucket/out/ \
#   scripts/submit_job.sh sweep --start 2024-01-01 --end 2024-03-01
#
# Any CLI subcommand works (supports | mine | score | sweep | curate |
# pack). The entrypoint attaches to the cluster (GRAFT_RAY_ADDRESS=auto)
# instead of starting a local Ray, and never constrains CPUs from the
# driver — the cluster size IS the resource budget.
#
# Scaling protocol (the sandbox analog lives in `python bench.py
# --scaling`, which runs fresh local sessions at 2 and 8 CPUs):
#   1. Run the SAME job on the N-node cluster; record
#      turns_per_sec_N from the job log (checkpoint metrics carry
#      per-partition wall times: state/checkpoint.py).
#   2. Scale the cluster to 4N nodes, delete the checkpoint dir (or
#      point OUT elsewhere), rerun identically; record
#      turns_per_sec_4N.
#   3. efficiency = turns_per_sec_4N / (4 * turns_per_sec_N); the
#      north-rule bar is >= 0.8. Record both throughputs + efficiency
#      in BASELINE.md alongside the bandwidth probe of each run.
#
# Resume: re-submitting the identical command after a mid-run failure
# skips finished partitions via the checkpoint manifests (idempotent
# writes, atomic publish) — no flag needed.
set -euo pipefail

DASH="${RAY_DASHBOARD:-http://127.0.0.1:8265}"
SUBCMD="${1:?usage: submit_job.sh <supports|mine|score|sweep|curate|pack> [args...]}"
shift

exec ray job submit \
  --address "$DASH" \
  --working-dir "$(git -C "$(dirname "$0")/.." rev-parse --show-toplevel)" \
  -- env GRAFT_RAY_ADDRESS=auto \
     python -m associationabacminer_ray "$SUBCMD" \
     ${INPUT:+--input "$INPUT"} ${OUT:+--out "$OUT"} "$@"
