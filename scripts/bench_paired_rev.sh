#!/usr/bin/env bash
# REVERSE-ordering twin of bench_paired.sh (VERDICT r17 task 8 / r18
# task 2): benches HEAD FIRST, then the baseline ref — together with
# the forward pair the two orderings bracket load drift (whichever leg
# runs second absorbs the box's residual heat; a code regression shows
# up in BOTH orderings, drift flips sign). Same idle gate before each
# leg, same single shell, same Bench JSON lines.
# Usage:
#   scripts/bench_paired_rev.sh <sf_dir> <out_json> <baseline_ref>
# Writes <out_json> (HEAD leg) and <out_json%.json>_baseline.json
# (baseline leg, benched SECOND).
set -euo pipefail
SF_DIR=${1:?usage: bench_paired_rev.sh <sf_dir> <out_json> <baseline_ref>}
OUT=${2:?need output json path}
BASE_REF=${3:?need baseline ref}

cores=$(nproc)

idle_gate() {
  local ok=0 i load load5
  for i in $(seq 1 120); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    load5=$(cut -d' ' -f2 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $cores * 0.05 and $load5 < $cores * 0.10 else 0)")
    [ "${GRAFT_BENCH_FORCE:-0}" = "1" ] && ok=1
    [ "$ok" = "1" ] && return 0
    echo "[bench_paired_rev] loadavg $load/$load5 too high for $cores cores; waiting ($i/120)" >&2
    sleep 10
  done
  echo "[bench_paired_rev] box never went idle after 120 retries; refusing (set GRAFT_BENCH_FORCE=1 to override)" >&2
  return 3
}

run_bench() {
  # r20 (VERDICT r19 task 2): tee the raw bench output to a kept log so
  # a failed leg is diagnosable ($1 names the leg; diagnostic state,
  # not a committed artifact)
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Bench" 2>&1 | tee "${OUT}.${1:-leg}.rawlog" | grep -o '{"metric".*}' | head -1
}

idle_gate
echo "[bench_paired_rev] HEAD (leg 1)" >&2
run_bench head > "$OUT"

dirty=$(git status --porcelain -uno | wc -l)
[ "$dirty" -gt 0 ] && git stash push -q -m bench_paired_rev
cur=$(git rev-parse --abbrev-ref HEAD)
restore() {
  git checkout -q "$cur" 2>/dev/null || true
  if [ "$dirty" -gt 0 ] && git stash list | grep -q bench_paired_rev; then
    git stash pop -q || true
  fi
}
trap restore EXIT
git checkout -q "$BASE_REF"
echo "[bench_paired_rev] baseline $BASE_REF (leg 2)" >&2
idle_gate
run_bench baseline > "${OUT%.json}_baseline.json"
git checkout -q "$cur"
[ "$dirty" -gt 0 ] && git stash pop -q
trap - EXIT
echo "[bench_paired_rev] wrote $OUT and ${OUT%.json}_baseline.json" >&2
