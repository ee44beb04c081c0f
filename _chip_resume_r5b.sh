#!/bin/bash
# Round-5 session-2 continuation. The VM rebooted mid-outage: /tmp/r5 (study
# checkpoints, datasets, eval result.pkls) is gone; only the committed
# _study_r5/ artifacts survive. This script resumes unattended when the chip
# answers, in strict priority order:
#   P0  benches that need no checkpoint (standing gather re-bench, realistic
#       lines, headline, chained post decomposition, conv layout scan)
#   P1  retrain the two VoD study checkpoints (fixed seed, ~12+7 min) and run
#       the remaining confirmatory evals from _chip_wait_r5.sh (knob isolation
#       J96/N20 + J128/N8, polar-trained hard-val basket + retrain-variance
#       control, q8 hard-val). None of these gate the round-5 decision
#       (BASELINE.md "hard-val decision table").
# All outputs land in _study_r5/session2/ inside the repo so they survive.
set -u
cd /root/repo
R=/tmp/r5
S=_study_r5/session2
mkdir -p $S $R/eval
log() { echo "[resume $(date +%H:%M:%S)] $*"; }

# wait for datasets (built on CPU by a parallel job; cheap, deterministic)
if [ -f /tmp/mkdata.pid ]; then
  while kill -0 "$(cat /tmp/mkdata.pid)" 2>/dev/null; do sleep 10; done
fi

log "polling for the chip (fresh-shape compile probe)"
while true; do
  N=$((257 + RANDOM % 512))
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.randn($N, $N + 3).astype(np.float32))
float((x @ x.T).sum())" >/dev/null 2>&1 && break
  sleep 60
done
log "chip is back (fresh compile served)"

# ---- P0: checkpoint-free benches
timeout 2400 python bench.py --vod > $S/bench_vod_rebench.json \
  2> $S/bench_vod_rebench.err || log "gather re-bench FAILED"
log "gather re-bench: $(cat $S/bench_vod_rebench.json 2>/dev/null)"
timeout 2400 python bench.py --vod --realistic > $S/bench_vod_realistic.json \
  2> $S/bench_vod_realistic.err || log "realistic gather bench FAILED"
timeout 2400 python bench.py > $S/bench_headline.json \
  2> $S/bench_headline.err || log "headline bench FAILED"
log "headline: $(cat $S/bench_headline.json 2>/dev/null)"
timeout 2400 python _bench_post.py > $S/bench_post_chained.log 2>&1 \
  || log "post bench FAILED"
timeout 2400 python _bench_conv_layout.py > $S/bench_conv_layout.log 2>&1 \
  || log "conv layout bench FAILED"
log "P0 benches done"

# ---- P1: retrain study checkpoints (same recipe/seed as _study_r5.sh)
CKG=$R/out/hgsfusion_vod/study_g/ckpt
CKP=$R/out/hgsfusion_vod_polar/study_p/ckpt
timeout 3600 python tools/train.py --cfg_file configs/hgsfusion_vod.yaml \
  --extra_tag study_g --output_dir $R/out --epochs 10 --workers 2 \
  --fix_random_seed --set DATA_CONFIG.DATA_PATH $R/vod \
  > $S/train_g.log 2>&1 || log "gather retrain FAILED"
log "gather retrain done: $(tail -1 $S/train_g.log)"
timeout 3600 python tools/train.py --cfg_file configs/hgsfusion_vod_polar.yaml \
  --extra_tag study_p --output_dir $R/out --epochs 10 --workers 2 \
  --fix_random_seed --set DATA_CONFIG.DATA_PATH $R/vod \
  > $S/train_p.log 2>&1 || log "polar retrain FAILED"
log "polar retrain done: $(tail -1 $S/train_p.log)"

eval_run() {  # cfg tag ckpt data [extra --set pairs...]
  local cfg=$1 tag=$2 ck=$3 data=$4; shift 4
  log "eval $tag"
  timeout 3600 python tools/test.py --cfg_file "$cfg" --extra_tag "$tag" \
    --output_dir $R/eval --ckpt_dir "$ck" --batch_size 1 \
    --set DATA_CONFIG.DATA_PATH "$data" "$@" > $S/eval_$tag.log 2>&1 \
    || log "EVAL $tag FAILED rc=$?"
}
res() { echo "$R/eval/$1/$2/eval/result.pkl"; }
match() {  # a_dir a_tag b_dir b_tag out ds_dir
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_polar_match.py \
    --a "$(res "$1" "$2")" --b "$(res "$3" "$4")" \
    --infos $R/$6/kitti_infos_val.pkl --dataset "${6%_hardval}" \
    --json $S/match_$5.json > $S/match_$5.log 2>&1 \
    || log "MATCH $5 FAILED rc=$?"
}
GV=hgsfusion_vod; PV=hgsfusion_vod_polar

# hard-val gather baseline (result.pkl was lost with /tmp)
eval_run configs/hgsfusion_vod.yaml       hv_vod_g_gather $CKG $R/vod_hardval
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar  $CKG $R/vod_hardval
match $GV hv_vod_g_gather $PV hv_vod_g_polar hv_vod_default vod_hardval

# knob isolation corners (J96/N20, J128/N8)
for JN in "96 20" "128 8"; do
  set -- $JN; J=$1; N=$2
  eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar_J${J}_N${N} \
    $CKG $R/vod_hardval \
    MODEL.FusionVFE.ImageVFE.F2V.POLAR_ZETA_BINS $J \
    MODEL.FusionVFE.ImageVFE.F2V.POLAR_NEAR_COLUMNS $N
  match $GV hv_vod_g_gather $PV hv_vod_g_polar_J${J}_N${N} \
    hv_vod_J${J}_N${N} vod_hardval
done

# polar-trained basket + retrain-variance control at hard-val scale
eval_run configs/hgsfusion_vod.yaml       hv_vod_p_gather $CKP $R/vod_hardval
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_p_polar  $CKP $R/vod_hardval
match $GV hv_vod_p_gather $PV hv_vod_p_polar hv_vod_p vod_hardval
match $GV hv_vod_g_gather $GV hv_vod_p_gather hv_vod_xw vod_hardval

# q8 on hard-val
eval_run configs/hgsfusion_vod_polar.yaml hv_vod_g_polar_q8 $CKG \
  $R/vod_hardval MODEL.FusionVFE.ImageVFE.FFN.DDN.QUANT w8a8
match $PV hv_vod_g_polar $PV hv_vod_g_polar_q8 hv_vod_q8 vod_hardval

log "RESUME DONE"
