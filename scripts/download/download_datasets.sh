#!/usr/bin/env bash
# Fetch the evaluation datasets (Vid4 + Tears-of-Steel clips, GT and
# pre-generated LR) into data/. Mirrors the layout the experiment YAMLs
# expect:
#   data/Vid4/{GT,Gaussian4xLR,Bicubic4xLR}/<sequence>/*.png
#   data/ToS3/{GT,Gaussian4xLR,Bicubic4xLR}/<sequence>/*.png
#
# The canonical copies live in the TecoGAN-TensorFlow release; any mirror
# with the same tree works. Set DATA_URL_BASE to your mirror.
set -e

DATA_URL_BASE=${DATA_URL_BASE:?set DATA_URL_BASE to a mirror hosting Vid4/ToS3 archives}
mkdir -p data

for archive in Vid4_GT Vid4_Gaussian4xLR Vid4_Bicubic4xLR \
               ToS3_GT ToS3_Gaussian4xLR ToS3_Bicubic4xLR; do
  echo ">> fetching ${archive}"
  curl -fL "${DATA_URL_BASE}/${archive}.zip" -o "data/${archive}.zip"
  unzip -q -o "data/${archive}.zip" -d data/
  rm "data/${archive}.zip"
done

echo ">> done. Generate LR data locally instead with:"
echo "   python scripts/resize_bd.py --gt_dir data/Vid4/GT --lr_dir data/Vid4/Gaussian4xLR"
echo "   python scripts/generate_lr_bi.py --gt_dir data/Vid4/GT --lr_dir data/Vid4/Bicubic4xLR"
