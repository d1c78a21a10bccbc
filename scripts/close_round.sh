#!/usr/bin/env bash
# Round-close bench procedure (round-15 verdict #6): the canonical
# committed artifact (bench_full.json -> BENCH_r{N}.json) must carry
# MERGED cross-run statistics (queries_min_xrun / best_total /
# bench_runs >= 2), not the single final-code re-run. Bench merges
# across runs keyed on git HEAD + a dirty-CODE-tree digest (bench
# artifacts and docs are excluded from the key), so the ordering that
# works is: commit ALL code first, THEN run the bench N times
# back-to-back on the clean head, THEN commit the artifact.
#
# Usage: scripts/close_round.sh <round> [n_runs] [sf_dir]
# Run from the repo root with a CLEAN code tree (src/, build.sbt,
# project/, scripts/ committed). Writes BENCH_r{N}_run{i}.json per run
# and BENCH_r{N}.json from the final merged bench_full.json, then
# verifies bench_runs >= 2 in the artifact.
set -euo pipefail
round="${1:?usage: close_round.sh <round> [n_runs] [sf_dir]}"
runs="${2:-2}"
sfdir="${3:-/root/testdata/sf0.1}"

if ! git diff --quiet HEAD -- src build.sbt project scripts ||
   [ -n "$(git status --porcelain -- src build.sbt project scripts)" ]; then
  echo "close_round: CODE tree is dirty — commit code before the bench" \
       "series (the merge key would fracture per run)" >&2
  exit 1
fi

for i in $(seq 1 "$runs"); do
  echo "== bench run $i/$runs"
  SPARK_GRAFT_SF_DIR="$sfdir" sbt -batch "runMain graft.Bench" \
    2>&1 | grep -F '"metric"' | head -1 > /dev/null
  cp bench_full.json "BENCH_r${round}_run${i}.json"
done

cp bench_full.json "BENCH_r${round}.json"
# the canonical artifact must RE-PARSE as JSON (r15's front-truncated
# capture silently cost round 16 its whole round-over-round table) —
# fail the close, never ship an unparseable artifact
python3 - "BENCH_r${round}.json" <<'EOF'
import json, sys
with open(sys.argv[1]) as f:
    txt = f.read().strip()
obj = json.loads(txt.splitlines()[-1])
for field in ("value", "queries", "queries_min_xrun", "queries_cold"):
    assert field in obj, f"artifact missing '{field}'"
print(f"close_round: artifact parses ({len(obj['queries'])} queries)")
EOF
n=$(grep -o '"bench_runs":[0-9]*' "BENCH_r${round}.json" | cut -d: -f2)
if [ "${n:-0}" -lt 2 ]; then
  echo "close_round: BENCH_r${round}.json carries bench_runs=$n < 2 —" \
       "the merge key fractured (head changed mid-series?)" >&2
  exit 1
fi
echo "close_round: BENCH_r${round}.json carries bench_runs=$n" \
     "(merged cross-run minimums)"
