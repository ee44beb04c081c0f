#!/bin/bash
# Chip work queued behind _hardval_r5.sh (one chip job at a time):
#   a. conv layout scan (VERDICT r4 weak #5's last unchecked lever)
#   b. standing gather-path re-bench (VERDICT r4 ask #6 runbook step)
#   c. headline bench line for the round record
set -u
cd /root/repo
R=/tmp/r5

if [ -f $R/hardval.pid ]; then
  while kill -0 "$(cat $R/hardval.pid)" 2>/dev/null; do sleep 30; done
fi
echo "[posthv $(date +%H:%M:%S)] hardval finished, starting"

python _bench_conv_layout.py > $R/bench_conv_layout.log 2>&1 \
  || echo "conv layout bench FAILED"
python bench.py --vod > $R/bench_vod_rebench.json \
  2> $R/bench_vod_rebench.err || echo "gather re-bench FAILED"
python bench.py > $R/bench_headline.json \
  2> $R/bench_headline.err || echo "headline bench FAILED"
echo "[posthv $(date +%H:%M:%S)] POST-HARDVAL DONE"
