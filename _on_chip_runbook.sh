#!/bin/bash
# Round-4 on-chip measurement sequence (VERDICT r3 #6: value-inverted
# order fixed). Runs unattended into _chip_log_r4.txt with heartbeats;
# each step bounded. Lessons encoded:
#   * XLA-only, always-informative steps run FIRST (headline benches,
#     stage tables, eval path, train step) — round 3 died mid-sequence
#     with none of them measured.
#   * Pallas steps run LAST and share a tripwire: after the first Mosaic
#     rejection every remaining pallas step is skipped (round 3 burned
#     ~9 min re-observing the same compile error). As of round 4 the
#     pallas gather is CLOSED negative on v5e (BASELINE.md: dynamic
#     vector.load rows must be 8-aligned) — these steps exist for a
#     future hardware generation.
#   * Every bench script warms up before timing (never trust the first
#     post-compile execution through the remote-exec tunnel).
set -u
LOG=/root/repo/_chip_log_r4.txt
cd /root/repo
PALLAS_DEAD=0
run() {
  local name="$1"; shift
  echo "=== [$(date -u +%FT%TZ)] START $name ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$rc ===" >> "$LOG"
  return $rc
}
run_pallas() {
  local name="$1"; shift
  if [ "$PALLAS_DEAD" = "1" ]; then
    echo "=== SKIP $name (prior Mosaic rejection) ===" >> "$LOG"
    return
  fi
  run "$name" "$@"
  if grep -q "Mosaic failed to compile" "$LOG"; then
    PALLAS_DEAD=1
    echo "=== tripwire: Mosaic rejection seen; skipping remaining pallas steps ===" >> "$LOG"
  fi
}
echo "=== runbook r4 pid $$ started $(date -u +%FT%TZ) ===" >> "$LOG"
# --- XLA-only, always informative ---
run bench_vod_polar     python bench.py
run bench_tj4d_polar    python bench.py --tj4d_polar
run stages_vod_polar    python _bench_stages.py --cfg configs/hgsfusion_vod_polar.yaml
run stages_vod_gather   python _bench_stages.py --cfg configs/hgsfusion_vod.yaml
run train_polar         python _bench_train.py --cfg configs/hgsfusion_vod_polar.yaml
run eval_path           python _bench_eval_path.py
run bench_vod_gather    python bench.py --vod
run bench_polar_b2      python bench.py --batch 2
run post_micro          python _bench_post.py
run polar_knob_scan     python _bench_polar_f2v.py
# --- pallas (closed negative on v5e; tripwired for future hardware) ---
run_pallas pallas_gather_micro python _bench_gather_pallas.py
run_pallas bench_vod_pallas    python bench.py --vod_pallas
run_pallas pallas_scatter_micro python _bench_scatter_pallas.py
run_pallas train_pallas        python _bench_train_pallas.py
echo "=== runbook r4 COMPLETE $(date -u +%FT%TZ) ===" >> "$LOG"
