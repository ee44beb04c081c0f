#!/bin/bash
# Round-5 continuation: hard-val ΔAP resolution + leftover post-study items.
#
# The 32-frame val sets quantize AP deltas to the 11-point protocol's
# 9.09-point recall steps (trained-model recall ~1.0 on the easy scenes);
# the 256-frame *_hardval sets grade per-box point support log-uniform in
# [0.02, 1.0] so recall sits in the PR-curve interior and ΔAP resolves
# below the 0.5-point north-star criterion.
#
# One chip job at a time (contention inflates timings 15%+).
set -u
cd /root/repo
R=/tmp/r5
mkdir -p $R/eval

CKG=$R/out/hgsfusion_vod/study_g/ckpt
CKP=$R/out/hgsfusion_vod_polar/study_p/ckpt
CKGT=$R/out/hgsfusion_tj4d/study_g/ckpt
CKPT=$R/out/hgsfusion_tj4d_polar/study_p/ckpt

log() { echo "[hardval $(date +%H:%M:%S)] $*"; }

eval_run() {  # cfg tag ckpt data [extra --set pairs...]
  local cfg=$1 tag=$2 ck=$3 data=$4; shift 4
  log "eval $tag"
  python tools/test.py --cfg_file "$cfg" --extra_tag "$tag" \
    --output_dir $R/eval --ckpt_dir "$ck" --batch_size 1 --infer_time \
    --set DATA_CONFIG.DATA_PATH "$data" "$@" > $R/eval_$tag.log 2>&1 \
    || log "EVAL $tag FAILED rc=$?"
}

# ---- 1. VoD hard-val: the headline decision table
eval_run configs/hgsfusion_vod.yaml       hv_vod_g_gather $CKG $R/vod_hardval
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar  $CKG $R/vod_hardval
# knob corners around the default (J128/N20)
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar_J96_N8 $CKG \
  $R/vod_hardval MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS 96 \
  MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS 8
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar_J192_N20 $CKG \
  $R/vod_hardval MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS 192 \
  MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS 20

# ---- 2. TJ4D hard-val
eval_run configs/hgsfusion_tj4d.yaml       hv_tj4d_g_gather $CKGT $R/tj4d_hardval
eval_run configs/hgsfusion_tj4d_polar.yaml hv_tj4d_g_polar  $CKGT $R/tj4d_hardval

# ---- 3. DDN w8a8 on hard-val (camera-stage approximation, same criterion)
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar_q8 $CKG \
  $R/vod_hardval MODEL.FusionVFE.ImageVFE.FFN.DDN.QUANT w8a8

# ---- 4. polar-trained basket on hard-val (training round trip evidence)
eval_run configs/hgsfusion_vod.yaml       hv_vod_p_gather $CKP $R/vod_hardval
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_p_polar  $CKP $R/vod_hardval

# ---- 5. leftover post-study items (interrupted by the host restart)
python bench.py --vod --realistic > $R/bench_vod_realistic.json \
  2> $R/bench_vod_realistic.err || echo "realistic gather bench FAILED"
python _bench_post.py > $R/bench_post_chained.log 2>&1 \
  || echo "post bench FAILED"

# ---- 6. box-level matches on hard-val (CPU)
res() { echo "$R/eval/$1/$2/eval/result.pkl"; }
match() {  # a_dir a_tag b_dir b_tag out ds infos_ds
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_polar_match.py \
    --a "$(res "$1" "$2")" --b "$(res "$3" "$4")" \
    --infos $R/$6/kitti_infos_val.pkl --dataset "${6%_hardval}" \
    --json $R/match_$5.json > $R/match_$5.log 2>&1 \
    || log "MATCH $5 FAILED rc=$?"
}
GV=hgsfusion_vod; PV=hgsfusion_vod_polar
GT=hgsfusion_tj4d; PT=hgsfusion_tj4d_polar
match $GV hv_vod_g_gather $PV hv_vod_g_polar          hv_vod_g       vod_hardval
match $GV hv_vod_g_gather $PV hv_vod_g_polar_J96_N8   hv_vod_J96N8   vod_hardval
match $GV hv_vod_g_gather $PV hv_vod_g_polar_J192_N20 hv_vod_J192N20 vod_hardval
match $GT hv_tj4d_g_gather $PT hv_tj4d_g_polar        hv_tj4d_g      tj4d_hardval
match $PV hv_vod_g_polar  $PV hv_vod_g_polar_q8       hv_vod_q8      vod_hardval
match $GV hv_vod_p_gather $PV hv_vod_p_polar          hv_vod_p       vod_hardval
log "HARDVAL DONE"
