#!/bin/bash
# Round-3 on-chip measurement sequence (VERDICT r2 #1-#3, #9).
# Runs unattended into _chip_log_r3b.txt with heartbeats; each step bounded.
# Order = value-density: settle the Mosaic/pallas verdict first (micro),
# then the flagship numbers, then batched serving, then train + stages + eval.
set -u
LOG=/root/repo/_chip_log_r3b.txt
cd /root/repo
run() {
  local name="$1"; shift
  echo "=== [$(date -u +%FT%TZ)] START $name ===" >> "$LOG"
  timeout 1200 "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$rc ===" >> "$LOG"
}
echo "=== runbook r3b pid $$ started $(date -u +%FT%TZ) ===" >> "$LOG"
run pallas_gather_micro python _bench_gather_pallas.py
run bench_vod_baseline  python bench.py
run bench_vod_pallas    python bench.py --vod_pallas
run bench_vod_pallas_b2 python bench.py --vod_pallas --batch 2
run bench_vod_pallas_b4 python bench.py --vod_pallas --batch 4
run bench_vod_b2        python bench.py --batch 2
run bench_tj4d          python bench.py --tj4d
run bench_tj4d_pallas   python bench.py --tj4d_pallas
run pallas_scatter_micro python _bench_scatter_pallas.py
run train_pallas        python _bench_train_pallas.py
run stages_vod          python _bench_stages.py --cfg configs/hgsfusion_vod.yaml
run stages_vod_pallas   python _bench_stages.py --cfg configs/hgsfusion_vod_pallas.yaml
run stages_pallas_b4    python _bench_stages.py --cfg configs/hgsfusion_vod_pallas.yaml --batch 4
run eval_path           python _bench_eval_path.py
echo "=== runbook r3b COMPLETE $(date -u +%FT%TZ) ===" >> "$LOG"
