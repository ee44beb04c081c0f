#!/bin/bash
# Round-5 chip work queued behind _study_r5.sh (one chip job at a time):
#   a. DDN w8a8 detection-level deltas (gather & polar @ gather-trained ckpt)
#   b. DDN backbone microbench bf16 vs w8a8
#   c. realistic-score bench lines (polar + gather)
#   d. post_process decomposition re-run with chained timing
set -u
cd /root/repo
R=/tmp/r5

if [ -f $R/study.pid ]; then
  while kill -0 "$(cat $R/study.pid)" 2>/dev/null; do sleep 30; done
fi
echo "[post $(date +%H:%M:%S)] study finished, starting"

CKG=$R/out/hgsfusion_vod/study_g/ckpt
Q8="MODEL.FusionVFE.ImageVFE.FFN.DDN.QUANT w8a8"

python tools/test.py --cfg_file configs/hgsfusion_vod.yaml \
  --extra_tag vod_g_gather_q8 --output_dir $R/eval --ckpt_dir $CKG \
  --batch_size 1 --infer_time \
  --set DATA_CONFIG.DATA_PATH $R/vod $Q8 \
  > $R/eval_vod_g_gather_q8.log 2>&1 || echo "q8 gather eval FAILED"
python tools/test.py --cfg_file configs/hgsfusion_vod_polar.yaml \
  --extra_tag vod_g_polar_q8 --output_dir $R/eval --ckpt_dir $CKG \
  --batch_size 1 --infer_time \
  --set DATA_CONFIG.DATA_PATH $R/vod $Q8 \
  > $R/eval_vod_g_polar_q8.log 2>&1 || echo "q8 polar eval FAILED"

python _bench_ddn_quant.py > $R/bench_ddn_quant.log 2>&1 \
  || echo "ddn quant bench FAILED"

python bench.py --realistic > $R/bench_polar_realistic.json \
  2> $R/bench_polar_realistic.err || echo "realistic polar bench FAILED"
python bench.py --vod --realistic > $R/bench_vod_realistic.json \
  2> $R/bench_vod_realistic.err || echo "realistic gather bench FAILED"

python _bench_post.py > $R/bench_post_chained.log 2>&1 \
  || echo "post bench FAILED"

# quant detection-level match (CPU)
res() { echo "$R/eval/$1/$2/eval/result.pkl"; }
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_polar_match.py \
  --a "$(res hgsfusion_vod vod_g_gather)" \
  --b "$(res hgsfusion_vod vod_g_gather_q8)" \
  --infos $R/vod/kitti_infos_val.pkl --dataset vod \
  --json $R/match_vod_q8_gather.json > $R/match_vod_q8_gather.log 2>&1 \
  || echo "q8 gather match FAILED"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_polar_match.py \
  --a "$(res hgsfusion_vod_polar vod_g_polar)" \
  --b "$(res hgsfusion_vod_polar vod_g_polar_q8)" \
  --infos $R/vod/kitti_infos_val.pkl --dataset vod \
  --json $R/match_vod_q8_polar.json > $R/match_vod_q8_polar.log 2>&1 \
  || echo "q8 polar match FAILED"
echo "[post $(date +%H:%M:%S)] POST-STUDY DONE"
