#!/usr/bin/env bash
# Verifies Bench's contention self-diagnosis: the same query subset is
# benched twice — once on the box as-is, once with one busy-loop spinner
# per core running alongside — and the second run's JSON must carry
# "contended":true while reporting the same schema of diagnostic fields.
#
# The spinners model exactly the failure BENCH_r06 hit: a box-wide
# competing load present for the WHOLE run, which min/median sampling
# cannot reject. Bench detects it as external runnable load (loadavg)
# far above this JVM's own CPU use.
#
# Usage: dev/bench_contention_check.sh   (from the repo root; ~3 min)
set -euo pipefail
cd "$(dirname "$0")/.."

SUBSET="a6_hist,dedup_exact,text_tokens,q1_agg,lang_hist"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT=dev/out
mkdir -p "$OUT"

run_bench() { # $1 = output tag
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_ONLY="$SUBSET" \
    sbt --error "runMain graft.Bench" >/dev/null
  cp dev/out/bench.json "$OUT/bench_$1.json"
}

echo "[contention-check] idle-ish run..."
run_bench idle

echo "[contention-check] spinning up $(nproc) busy loops..."
PIDS=()
for _ in $(seq "$(nproc)"); do
  (while :; do :; done) & PIDS+=($!)
done
trap 'kill "${PIDS[@]}" 2>/dev/null || true' EXIT
# let the 1-min load average absorb the spinners before the timed section
sleep 45

echo "[contention-check] contended run..."
run_bench loaded
kill "${PIDS[@]}" 2>/dev/null || true
trap - EXIT

python3 - <<'EOF'
import json
idle = json.load(open('dev/out/bench_idle.json'))
loaded = json.load(open('dev/out/bench_loaded.json'))
for k in ('loadavg_start', 'loadavg_end', 'bench_cpu_sec', 'external_load_est', 'contended', 'queries_cpu'):
    assert k in idle and k in loaded, f'missing diagnostic field {k}'
assert loaded['contended'] is True, f"loaded run not flagged: {loaded['external_load_est']=}"
print(f"OK: idle contended={idle['contended']} (ext={idle['external_load_est']:.1f}), "
      f"loaded contended={loaded['contended']} (ext={loaded['external_load_est']:.1f})")
EOF
