#!/bin/sh
# Fetch the nerf_synthetic dataset (reference: Phase2/get_nerf_dataset.sh
# pulls the Kaggle mirror).  Run from the repo root; needs network access.
set -e
cd "$(dirname "$0")"
curl -L -o nerf_synthetic.zip \
  "https://www.kaggle.com/api/v1/datasets/download/nguyenhung1903/nerf-synthetic-dataset"
unzip -q nerf_synthetic.zip
rm nerf_synthetic.zip
echo "nerf_synthetic ready: $(ls nerf_synthetic | tr '\n' ' ')"
