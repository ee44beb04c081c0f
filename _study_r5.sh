#!/bin/bash
# Round-5 detection-level polar-vs-gather equivalence study (chip runbook).
#
# Prereqs: datasets built (python tools/make_study_data.py --root /tmp/r5)
# and the VoD gather training already launched:
#   python tools/train.py --cfg_file configs/hgsfusion_vod.yaml \
#     --extra_tag study_g --output_dir /tmp/r5/out --epochs 10 --workers 2 \
#     --fix_random_seed --set DATA_CONFIG.DATA_PATH /tmp/r5/vod
# with its pid in /tmp/r5/train_g.pid.
#
# Sequence (one chip job at a time — contention inflates timings 15%+):
#   1. wait for the gather train           -> ckpt_g
#   2. polar train, same recipe/seed       -> ckpt_p  (loss should track)
#   3. 2x2 eval: {ckpt_g, ckpt_p} x {gather, polar}   (official protocol)
#   4. J/N knob scan: ckpt_g through polar J in {96,128,192} x N in {8,20}
#   5. TJ4D: gather train, polar train, 2x2 eval + default-knob scan
#   6. box-level match + official-AP deltas (CPU) -> /tmp/r5/match_*.json
set -u
cd /root/repo
R=/tmp/r5
mkdir -p $R/eval

CKG=$R/out/hgsfusion_vod/study_g/ckpt
CKP=$R/out/hgsfusion_vod_polar/study_p/ckpt
CKGT=$R/out/hgsfusion_tj4d/study_g/ckpt
CKPT=$R/out/hgsfusion_tj4d_polar/study_p/ckpt

log() { echo "[study $(date +%H:%M:%S)] $*"; }

# ---- 1. wait for the gather train
if [ -f $R/train_g.pid ]; then
  while kill -0 "$(cat $R/train_g.pid)" 2>/dev/null; do sleep 20; done
fi
log "gather train done: $(tail -1 $R/train_g.log)"

# ---- 2. polar train (same data, seed, schedule)
python tools/train.py --cfg_file configs/hgsfusion_vod_polar.yaml \
  --extra_tag study_p --output_dir $R/out --epochs 10 --workers 2 \
  --fix_random_seed --set DATA_CONFIG.DATA_PATH $R/vod \
  > $R/train_p.log 2>&1
log "polar train done: $(tail -1 $R/train_p.log)"

# ---- helper: one eval run (batch 1: the gather path OOMs at B>=2)
eval_run() {  # cfg tag ckpt data [extra --set pairs...]
  local cfg=$1 tag=$2 ck=$3 data=$4; shift 4
  log "eval $tag"
  python tools/test.py --cfg_file "$cfg" --extra_tag "$tag" \
    --output_dir $R/eval --ckpt_dir "$ck" --batch_size 1 --infer_time \
    --set DATA_CONFIG.DATA_PATH "$data" "$@" > $R/eval_$tag.log 2>&1 \
    || log "EVAL $tag FAILED rc=$?"
}

# ---- 3. VoD 2x2
eval_run configs/hgsfusion_vod.yaml        vod_g_gather $CKG $R/vod
eval_run configs/hgsfusion_vod_polar.yaml  vod_g_polar  $CKG $R/vod
eval_run configs/hgsfusion_vod.yaml        vod_p_gather $CKP $R/vod
eval_run configs/hgsfusion_vod_polar.yaml  vod_p_polar  $CKP $R/vod

# ---- 4. J/N scan (gather-trained weights through polar at each knob)
for J in 96 128 192; do
  for N in 8 20; do
    [ "$J" = 128 ] && [ "$N" = 20 ] && continue  # = vod_g_polar above
    eval_run configs/hgsfusion_vod_polar.yaml vod_g_polar_J${J}_N${N} \
      $CKG $R/vod \
      MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS $J \
      MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS $N
  done
done

# ---- 5. TJ4D: train both, 2x2 + default knob (B=1 keeps HBM headroom)
python tools/train.py --cfg_file configs/hgsfusion_tj4d.yaml \
  --extra_tag study_g --output_dir $R/out --epochs 10 --batch_size 1 \
  --workers 2 --fix_random_seed --set DATA_CONFIG.DATA_PATH $R/tj4d \
  > $R/train_tg.log 2>&1
log "tj4d gather train done: $(tail -1 $R/train_tg.log)"
python tools/train.py --cfg_file configs/hgsfusion_tj4d_polar.yaml \
  --extra_tag study_p --output_dir $R/out --epochs 10 --batch_size 1 \
  --workers 2 --fix_random_seed --set DATA_CONFIG.DATA_PATH $R/tj4d \
  > $R/train_tp.log 2>&1
log "tj4d polar train done: $(tail -1 $R/train_tp.log)"

eval_run configs/hgsfusion_tj4d.yaml       tj4d_g_gather $CKGT $R/tj4d
eval_run configs/hgsfusion_tj4d_polar.yaml tj4d_g_polar  $CKGT $R/tj4d
eval_run configs/hgsfusion_tj4d.yaml       tj4d_p_gather $CKPT $R/tj4d
eval_run configs/hgsfusion_tj4d_polar.yaml tj4d_p_polar  $CKPT $R/tj4d
# TJ4D knob sensitivity: the two scan corners around the default
eval_run configs/hgsfusion_tj4d_polar.yaml tj4d_g_polar_J96_N8 $CKGT \
  $R/tj4d MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS 96 \
  MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS 8
eval_run configs/hgsfusion_tj4d_polar.yaml tj4d_g_polar_J192_N20 $CKGT \
  $R/tj4d MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS 192 \
  MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS 20

# ---- 6. box-level match + AP deltas (CPU)
res() { echo "$R/eval/$1/$2/eval/result.pkl"; }
match() {  # a_dir a_tag b_dir b_tag out ds
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_polar_match.py \
    --a "$(res "$1" "$2")" --b "$(res "$3" "$4")" \
    --infos $R/$6/kitti_infos_val.pkl --dataset "$6" \
    --json $R/match_$5.json > $R/match_$5.log 2>&1 \
    || log "MATCH $5 FAILED rc=$?"
}
GV=hgsfusion_vod; PV=hgsfusion_vod_polar
GT=hgsfusion_tj4d; PT=hgsfusion_tj4d_polar
match $GV vod_g_gather $PV vod_g_polar       vod_g   vod
match $GV vod_p_gather $PV vod_p_polar       vod_p   vod
for J in 96 128 192; do for N in 8 20; do
  [ "$J" = 128 ] && [ "$N" = 20 ] && continue
  match $GV vod_g_gather $PV vod_g_polar_J${J}_N${N} vod_J${J}N${N} vod
done; done
match $GT tj4d_g_gather $PT tj4d_g_polar     tj4d_g  tj4d
match $GT tj4d_p_gather $PT tj4d_p_polar     tj4d_p  tj4d
match $GT tj4d_g_gather $PT tj4d_g_polar_J96_N8   tj4d_J96N8   tj4d
match $GT tj4d_g_gather $PT tj4d_g_polar_J192_N20 tj4d_J192N20 tj4d
# cross baskets: same-path different-weights (training equivalence)
match $GV vod_g_gather $GV vod_p_gather      vod_xw  vod
log "STUDY DONE"
