#!/bin/bash
# TPU training launcher — the cluster-launcher analog of the reference's
# SLURM script (send_turing.sh: 1 node, 1 GPU, 12h, --n_rays_batch 16384).
#
# On a Cloud TPU VM this is the whole job: no scheduler preamble, no venv
# gymnastics — jax.distributed picks up the TPU topology from the
# environment.  For multi-host slices, run the same command on every host
# (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).
set -euo pipefail
cd "$(dirname "$0")"

DATA_PATH="${DATA_PATH:-./Phase2/nerf_synthetic/lego/}"
N_RAYS="${N_RAYS:-16384}"          # send_turing.sh:19 trains at 16384
MAX_ITERS="${MAX_ITERS:-200001}"

exec python Phase2/train.py \
  --data_path "$DATA_PATH" \
  --mode train \
  --n_rays_batch "$N_RAYS" \
  --max_iters "$MAX_ITERS" \
  "$@"
