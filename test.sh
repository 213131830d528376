#!/usr/bin/env bash
# Usage: bash ./test.sh <degradation: BD|BI> <model: Model/ExpName>
set -e

degradation=$1
model=$2

if [ -z "$degradation" ] || [ -z "$model" ]; then
  echo "Usage: bash ./test.sh <BD|BI> <Model/ExpName>"
  exit 1
fi

exp_dir=./experiments_${degradation}/${model}

python -m tecogan_tpu.main \
  --exp_dir "${exp_dir}" \
  --mode test \
  --opt "${exp_dir}/test.yml" \
  --gpu_ids "${GPU_IDS:-0}"
