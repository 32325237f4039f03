#!/usr/bin/env bash
# ray-job smoke (CLUSTER.md): submit the index build + a search through
# the Ray Jobs API and assert a hit. Run from the repo root on any
# machine where a Ray head is reachable (start one with:
#   ray start --head --num-cpus=8
# the job server listens on :8265). On the CI sandbox there is no
# dashboard/job server, so this script is exercised by hand on real
# clusters; the same driver commands run in-process in the test suite.
set -euo pipefail

ADDR="${RAY_JOB_ADDRESS:-http://127.0.0.1:8265}"
WORK="${RAY_SMOKE_DIR:-/tmp/ray_job_smoke}"
rm -rf "$WORK" && mkdir -p "$WORK"

# 1. generate a deterministic 2k-doc corpus via the job API
ray job submit --address "$ADDR" --working-dir . -- \
  python -m search_engine_ray gen "$WORK/corpus" 2000 --seed 7

# 2. build the index (resumable: a re-submit after preemption skips
#    finished shards)
ray job submit --address "$ADDR" --working-dir . -- \
  python -m search_engine_ray build "$WORK/corpus" "$WORK/index" \
  --resumable --buckets 8 --parts 8

# 3. search and assert a hit
OUT=$(ray job submit --address "$ADDR" --working-dir . -- \
  python -m search_engine_ray search "$WORK/index" tokenizer --k 5 \
  --buckets 8 --parts 8)
echo "$OUT" | grep -q '"total"' || { echo "FAIL: no search output"; exit 1; }
echo "ray job smoke OK"
