#!/bin/bash
# Isolate which knob carries the J96/N8 ROI failure on the hard-val set:
# J96/N20 (zeta bins alone) vs J128/N8 (near-field width alone). If
# J96/N20 passes the 0.5-dAP criterion it is also a candidate default
# (saves ~0.5 ms vs J128). Chained behind _post_hardval_r5.sh.
set -u
cd /root/repo
R=/tmp/r5

if [ -f $R/posthv.pid ]; then
  while kill -0 "$(cat $R/posthv.pid)" 2>/dev/null; do sleep 30; done
fi
echo "[knobiso $(date +%H:%M:%S)] starting"

CKG=$R/out/hgsfusion_vod/study_g/ckpt
for JN in "96 20" "128 8"; do
  set -- $JN; J=$1; N=$2
  python tools/test.py --cfg_file configs/hgsfusion_vod_polar.yaml \
    --extra_tag hv_vod_g_polar_J${J}_N${N} --output_dir $R/eval \
    --ckpt_dir $CKG --batch_size 1 \
    --set DATA_CONFIG.DATA_PATH $R/vod_hardval \
    MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS $J \
    MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS $N \
    > $R/eval_hv_vod_g_polar_J${J}_N${N}.log 2>&1 \
    || echo "EVAL J${J}N${N} FAILED"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_polar_match.py \
    --a $R/eval/hgsfusion_vod/hv_vod_g_gather/eval/result.pkl \
    --b $R/eval/hgsfusion_vod_polar/hv_vod_g_polar_J${J}_N${N}/eval/result.pkl \
    --infos $R/vod_hardval/kitti_infos_val.pkl --dataset vod \
    --json $R/match_hv_vod_J${J}_N${N}.json \
    > $R/match_hv_vod_J${J}_N${N}.log 2>&1 || echo "MATCH J${J}N${N} FAILED"
done
echo "[knobiso $(date +%H:%M:%S)] KNOBISO DONE"
