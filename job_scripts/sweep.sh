#!/bin/bash
# Hyperparameter sweep job (reference job_scripts/sweep.sh ran a wandb agent;
# here the self-contained sweep runner).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SWEEP="${SWEEP:-$REPO/configs/sweeps/tsdf_one_frame.yaml}"
OUT="${OUT:-$REPO/logs/sweeps/$(date +%Y-%m-%d_%H-%M-%S)}"
python "$REPO/scripts/sweep.py" --config "$SWEEP" --output "$OUT" "$@"
