#!/usr/bin/env bash
# Multi-device training launcher.
#
# Reference equivalent: tools/scripts/dist_train.sh spawned one torch process
# per GPU via torch.distributed.launch over NCCL. Under JAX SPMD a single
# process drives every local TPU chip through a jax.sharding.Mesh — no
# launcher, no port negotiation; tools/train.py shards the global batch over
# all visible devices automatically. Multi-HOST pods additionally set the
# JAX distributed env (coordinator address) before invoking this script.
#
# Usage: bash tools/scripts/dist_train.sh <cfg_file> [extra train.py args]
set -euo pipefail
CFG=$1; shift
exec python tools/train.py --cfg_file "$CFG" "$@"
