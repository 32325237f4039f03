#!/usr/bin/env bash
# Cluster-connect smoke: start a real `ray start --head` cluster, drive
# the full CLI pipeline against it via RAY_ADDRESS (the same
# driver-connects-to-cluster mode a `ray job submit` entrypoint uses),
# and assert a search hit. This is runnable in the sandbox (unlike
# ray_job_smoke.sh, which needs the ray[default] jobs SDK) and was run
# green in round 5 — see CLUSTER.md.
set -euo pipefail

PORT="${RAY_SMOKE_PORT:-6400}"
WORK="${RAY_SMOKE_DIR:-/tmp/cl_smoke}"
cd "$(dirname "$0")/.."

ray start --head --num-cpus=4 --port="$PORT" >/dev/null 2>&1
trap 'ray stop >/dev/null 2>&1 || true' EXIT
sleep 3

rm -rf "$WORK"
export RAY_ADDRESS="127.0.0.1:$PORT"
python -m search_engine_ray gen "$WORK/corpus" 2000 --seed 7 >/dev/null
python -m search_engine_ray build "$WORK/corpus" "$WORK/index" \
  --resumable --buckets 8 --parts 8 >/dev/null
OUT=$(python -m search_engine_ray search "$WORK/index" tokenizer --k 3 \
  --buckets 8 --parts 8)
echo "$OUT" | python -c 'import json,sys; r=json.load(sys.stdin); assert r["total"] > 0 and r["data"], r; print("cluster-connect smoke OK: total =", r["total"])'
# resumable re-run must skip every shard (manifest checkpoint)
python -m search_engine_ray build "$WORK/corpus" "$WORK/index" \
  --resumable --buckets 8 --parts 8 >/dev/null
echo "resume-skip OK"
