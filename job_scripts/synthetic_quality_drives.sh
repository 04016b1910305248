#!/bin/bash
# Synthetic-data quality drives: regenerate the multi-geometry datasets and
# run the full train -> predict -> eval CLI loop per experiment, sequentially
# on one chip. This is the repo copy of the round-3 queued-drive
# orchestration (BENCH.md quality sections) so a node-local /tmp wipe never
# costs the queue again; harvest logs with scripts/local/harvest_drives.py.
#
# Usage: WORK=/tmp job_scripts/synthetic_quality_drives.sh [drive ...]
#   drives (default: all): voxelnet multigeo4 multigeo3_big
set -u

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${WORK:-/tmp}"
cd "$REPO"

ensure_dataset() {  # dir --train N --families ...
  local dir=$1; shift
  [ -f "$dir/val.txt" ] && return 0
  python scripts/local/make_multigeo_dataset.py --out "$dir" "$@" \
    > "$dir.gen.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ] || [ ! -f "$dir/val.txt" ]; then
    echo "DATASET GENERATION FAILED for $dir (rc=$rc, see $dir.gen.log)" >&2
    return 1
  fi
}

run_drive() {  # name experiment data_dir [extra train overrides...]
  local name=$1 exp=$2 data=$3; shift 3
  echo "=== drive $name : train ($(date -u +%H:%M:%S)) ==="
  timeout 14400 python scripts/train.py "experiment=$exp" \
    "paths.data_dir=$data" "paths.output_dir=$WORK/${name}_run" \
    logger=csv "$@" > "$WORK/${name}_train.log" 2>&1
  echo "train rc=$? ($(date -u +%H:%M:%S))"
  echo "=== drive $name : predict ==="
  # voxel_types=[tsdf] loads the GT volume for grid PLACEMENT only (the
  # reference inference origin shift, data.py:354-367) — the model still
  # reconstructs from frames alone. The GT-less fallback origin [0,0,-0.5]
  # assumes ScanNet-convention positive-octant scenes and would crop these
  # origin-centered synthetic scenes to one quadrant (recall ~0.25).
  timeout 3600 python scripts/predict.py \
    "ckpt_path=$WORK/${name}_run/checkpoints" \
    "paths.data_dir=$data" "paths.output_dir=$WORK/${name}_pred" \
    "data.datasets_test=[val.txt]" "data.dataset_type=scenes" \
    "data.num_frames_test=8" "data.voxel_size=0.04" \
    "data.voxel_dim_test=[96,96,56]" "data.voxel_types=[tsdf]" \
    > "$WORK/${name}_predict.log" 2>&1
  echo "predict rc=$?"
  echo "=== drive $name : eval ==="
  timeout 3600 python -m gennerf_tpu.eval.evaluation \
    --results "$WORK/${name}_pred" --dataset "$data/val.txt" \
    --data-dir "$data" > "$WORK/${name}_eval.log" 2>&1
  echo "eval rc=$?"
  timeout 1800 python -m gennerf_tpu.eval.evaluation_tsdf \
    --results "$WORK/${name}_pred" --dataset "$data/val.txt" \
    --data-dir "$data" > "$WORK/${name}_eval_tsdf.log" 2>&1
  echo "eval_tsdf rc=$? ($(date -u +%H:%M:%S))"
}

want() {  # drive name selected?
  [ $# -eq 0 ] && return 0
  local d; for d in "$@"; do [ "$d" = "$WANTED" ] && return 0; done
  return 1
}

for WANTED in voxelnet multigeo4 multigeo3_big; do
  want "$@" || continue
  case "$WANTED" in
    voxelnet)
      ensure_dataset "$WORK/multigeo" --train 8 || continue
      run_drive voxelnet seqs_multigeo_voxelnet "$WORK/multigeo" ;;
    multigeo4)
      ensure_dataset "$WORK/multigeo4" --train 12 \
        --families spheres,boxes,cylinders,rooms || continue
      run_drive multigeo4 seqs_multigeo4_4cm "$WORK/multigeo4" ;;
    multigeo3_big)
      ensure_dataset "$WORK/multigeo3" --train 9 \
        --families spheres,boxes,cylinders || continue
      run_drive multigeo3_big seqs_multigeo3_4cm_big "$WORK/multigeo3" ;;
  esac
done

echo "ALL DRIVES DONE $(date -u)"
