#!/usr/bin/env bash
# Fetch pretrained reference checkpoints into pretrained_models/. The .pth
# files are converted on load (tecogan_tpu/models/convert.py), or ahead of
# time with scripts/convert_checkpoint.py.
set -e

MODEL_URL_BASE=${MODEL_URL_BASE:?set MODEL_URL_BASE to a mirror hosting the checkpoints}
mkdir -p pretrained_models

for ckpt in FRVSR_BD_iter400000 FRVSR_BI_iter400000 \
            TecoGAN_4x_BD_Vimeo_iter500K TecoGAN_4x_BI_Vimeo_iter500K \
            TecoGAN_2x_BD_REDS_iter500K; do
  echo ">> fetching ${ckpt}.pth"
  curl -fL "${MODEL_URL_BASE}/${ckpt}.pth" -o "pretrained_models/${ckpt}.pth"
done
