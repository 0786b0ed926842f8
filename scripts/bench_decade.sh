#!/usr/bin/env bash
# Decade-probe protocol: run graft.Bench over a ScaleGen dir BEHIND the
# same idle gate bench_paired.sh uses. Round-13 lesson: the r13 decade
# pair was first committed from a box at loadavg ~9 and the tail ran
# 2-3x inflated (q20 55s vs 19.6s idle, q115 10.6s vs 3.2s) — a decade
# RATIO artifact is only meaningful when both points are measured idle.
# Round-17 lesson (VERDICT r16 task 2, the second 0-byte 100x anchor):
# the artifact is VALIDATED before this script exits 0 — it must exist,
# be non-empty, parse as JSON, and carry a non-empty "queries" map; a
# crashed bench leaves no half-written artifact behind.
# Usage:
#   scripts/bench_decade.sh <scale_dir> <out_json>
set -euo pipefail
SF_DIR=${1:?usage: bench_decade.sh <scale_dir> <out_json>}
OUT=${2:?need output json path}

cores=$(nproc)
ok=0
for i in $(seq 1 120); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  load5=$(cut -d' ' -f2 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < $cores * 0.05 and $load5 < $cores * 0.10 else 0)")
  [ "${GRAFT_BENCH_FORCE:-0}" = "1" ] && ok=1
  [ "$ok" = "1" ] && break
  echo "[bench_decade] loadavg $load/$load5 too high for $cores cores; waiting ($i/120)" >&2
  sleep 10
done
if [ "$ok" != "1" ]; then
  echo "[bench_decade] box never went idle; refusing (GRAFT_BENCH_FORCE=1 to override)" >&2
  exit 3
fi

TMP_OUT=$(mktemp "${OUT}.XXXXXX")
cleanup() { rm -f "$TMP_OUT"; }
trap cleanup EXIT

# r20 (VERDICT r19 task 2): TEE the raw bench stdout/stderr to a kept
# log — the r19 100x post-mortem was guesswork because this grep kept
# only the JSON line and the per-query error text died with the pipe.
# The raw log is diagnostic state, not a committed artifact.
RAW_LOG="${OUT}.rawlog"
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" 2>&1 | tee "$RAW_LOG" | grep -o '{"metric".*}' | head -1 > "$TMP_OUT" || true
echo "[bench_decade] raw log kept at $RAW_LOG" >&2

# refuse to exit 0 on an empty/truncated/metric-less artifact (the r14
# and r16 0-byte 100x blemish class): validate BEFORE moving into place
python3 - "$TMP_OUT" <<'EOF'
import json, sys
path = sys.argv[1]
try:
    with open(path) as f:
        d = json.load(f)
except Exception as e:
    sys.exit(f"[bench_decade] artifact is not parseable JSON: {e}")
if not isinstance(d, dict) or not d.get("queries"):
    sys.exit("[bench_decade] artifact has no queries map — bench crashed?")
if not isinstance(d.get("value"), (int, float)):
    sys.exit("[bench_decade] artifact has no numeric value")
print(f"[bench_decade] validated: {len(d['queries'])} queries, "
      f"{d['value']:.1f} {d.get('unit', '?')}", file=sys.stderr)
EOF

mv "$TMP_OUT" "$OUT"
trap - EXIT
echo "[bench_decade] wrote $OUT" >&2
