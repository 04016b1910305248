#!/bin/bash
# Dataset preparation job (reference job_scripts/read_scannet.sh +
# generate_tsdf*.sh): export .sens, build metadata, fuse GT TSDFs.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
RAW="${RAW:?set RAW=<path to raw scannet>}"
OUT="${OUT:?set OUT=<path for prepared data>}"
SHARD="${SHARD:-0}"
NSHARDS="${NSHARDS:-1}"

python "$REPO/scripts/read_scannet.py" --path "$RAW" --output "$OUT/export" \
  --workers "${WORKERS:-16}" --i "$SHARD" --n "$NSHARDS"

python -m gennerf_tpu.data.prepare.prepare_data \
  --path "$OUT/export" --path_meta "$OUT/meta" --i "$SHARD" --n "$NSHARDS"
