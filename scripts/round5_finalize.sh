#!/bin/bash
# End-of-round finalization: run AFTER stopping the training campaign
# (kill the exact PID in /tmp/campaign_r5.pid; never pkill by pattern).
#
#   bash scripts/round5_finalize.sh <last_model_idx>
#
# <last_model_idx> = highest model_N index complete across ALL
# experiment dirs (the campaign trains parts start..end, part p writes
# model_{p+1}).
#
# Steps: stats + params exports + Kodak RD study (rd_campaign skips
# finished training parts), BSDS study, per-gamma stability protocol,
# then the final bench. Anchors cache under the study dirs; HM runs at
# ~0.65 s/image/QP on the synthetic content.

set -euo pipefail
cd "$(dirname "$0")/.."

LAST=${1:?usage: round5_finalize.sh <last_model_idx>}
HM=build/HM-16.15/bin/TAppEncoderStatic

# 1. Stats (device) + exports + Kodak study with true coded rates.
python scripts/rd_campaign.py --nb_parts "$LAST" \
    --out results/eae/kodak_rd --hevc_encoder "$HM" \
    --hevc_qps 22 27 32 37 42 47 51

# 2. BSDS study (second test set, reference's dual evaluation).
python -m autoencoder_based_image_compression_tpu.cli.reconstruct_kodak \
    --use_bsds --path_to_bsds data/campaign/bsds.npy --code_lossless \
    --idx_training "$LAST" --results_root results/eae \
    --cache_dir results/eae/bsds_rd --hevc_encoder "$HM" \
    --hevc_qps 22 27 32 37 42 47 51

# 3. Per-gamma family stability protocol (K-checkpoint averaging).
python scripts/stability_study.py --k 3 --hevc_encoder "$HM" \
    --hevc_qps 22 27 32 37 42 47 51

# 4. Final bench on the refreshed weights.
python bench.py | tee build/bench_final_r5.json
