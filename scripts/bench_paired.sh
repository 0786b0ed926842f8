#!/usr/bin/env bash
# Paired benchmark protocol (VERDICT r4/r5: a bench artifact is only
# comparable when both builds run back-to-back in ONE shell on an idle
# box). Usage:
#   scripts/bench_paired.sh <sf_dir> <out_json> [<baseline_ref>]
#
# - refuses to start EACH LEG until the 1-minute loadavg < 5% of core
#   count (~1.6 on a 32-core box; VERDICT r6: the old 25% gate let
#   loadavg 2.60 through and the artifact's tail was 3-8x inflated)
#   AND the 5-minute loadavg < 10% of cores (r7: a 1-min gate alone
#   passes ~90s after a heavy run while GC/page-cache churn still
#   inflates every query ~25%). R17 (VERDICT r16 task 8): the gate
#   re-runs BEFORE THE SECOND LEG too — the r16 fwd pair started its
#   HEAD leg at loadavg 5.5/8.9 because the gate ran once at pair
#   start, manufacturing a 1.40x artifact. Override with
#   GRAFT_BENCH_FORCE=1;
# - if <baseline_ref> is given, stashes the working tree, benches the
#   baseline commit first, restores, then benches HEAD — same shell,
#   same box, interleaved in time; an exit trap restores the original
#   branch and pops the stash even when the baseline bench fails;
# - Bench.scala itself stamps /proc/loadavg into each JSON line, so the
#   artifact records the conditions it was measured under.
set -euo pipefail
SF_DIR=${1:?usage: bench_paired.sh <sf_dir> <out_json> [<baseline_ref>]}
OUT=${2:?need output json path}
BASE_REF=${3:-}

cores=$(nproc)

# wait (up to ~20 min) for an idle box; called before EVERY bench leg
idle_gate() {
  local ok=0 i load load5
  for i in $(seq 1 120); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    load5=$(cut -d' ' -f2 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $cores * 0.05 and $load5 < $cores * 0.10 else 0)")
    [ "${GRAFT_BENCH_FORCE:-0}" = "1" ] && ok=1
    [ "$ok" = "1" ] && return 0
    echo "[bench_paired] loadavg $load/$load5 too high for $cores cores; waiting ($i/120)" >&2
    sleep 10
  done
  # never silently bench a never-idle box (ADVICE r7): a contaminated
  # artifact requires the explicit GRAFT_BENCH_FORCE=1 override
  echo "[bench_paired] box never went idle after 120 retries; refusing (set GRAFT_BENCH_FORCE=1 to override)" >&2
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

if [ -n "$BASE_REF" ]; then
  # count TRACKED changes only: untracked files (e.g. the bench jsons
  # themselves) don't block a checkout, and `git stash push` ignores
  # them — counting them made dirty>0 with an EMPTY stash, so the later
  # pop failed and set -e killed the run between baseline and HEAD
  dirty=$(git status --porcelain -uno | wc -l)
  [ "$dirty" -gt 0 ] && git stash push -q -m bench_paired
  cur=$(git rev-parse --abbrev-ref HEAD)
  restore() {
    # runs on ANY exit: never leave the tree on the baseline ref with
    # the stash unpopped (ADVICE r6)
    git checkout -q "$cur" 2>/dev/null || true
    if [ "$dirty" -gt 0 ] && git stash list | grep -q bench_paired; then
      git stash pop -q || true
    fi
  }
  trap restore EXIT
  git checkout -q "$BASE_REF"
  echo "[bench_paired] baseline $BASE_REF" >&2
  run_bench baseline > "${OUT%.json}_baseline.json"
  git checkout -q "$cur"
  [ "$dirty" -gt 0 ] && git stash pop -q
  trap - EXIT
  # the baseline leg heats the box; re-gate so the HEAD leg starts as
  # idle as the baseline leg did (VERDICT r16 task 8)
  idle_gate
fi

echo "[bench_paired] HEAD" >&2
run_bench head > "$OUT"
echo "[bench_paired] wrote $OUT" >&2
