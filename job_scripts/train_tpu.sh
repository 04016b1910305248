#!/bin/bash
# TPU training job (the reference's SLURM train.sh equivalent,
# job_scripts/train.sh: stage data to node-local disk, then train).
# Run on a TPU VM; for pods launch with your pod runner on every worker.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA_SRC="${DATA_SRC:-$REPO/data/scannet}"
STAGE_DIR="${TMPDIR:-/tmp}/scannet_stage"
EXPERIMENT="${EXPERIMENT:-seq1_frames8_evenspaced_pointnet}"

# stage the dataset to fast local disk and retarget info.json paths
python "$REPO/scripts/staging.py" \
  --splits scannet_train.txt scannet_val.txt scannet_test.txt \
  --source "$DATA_SRC" --target "$STAGE_DIR" --untar

python "$REPO/scripts/train.py" \
  "experiment=$EXPERIMENT" \
  trainer=tpu \
  "paths.data_dir=$STAGE_DIR" \
  "$@"
