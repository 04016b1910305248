#!/bin/bash
# Full-lifecycle dry-run (VERDICT round-3 next #8): chain EVERY stage of
# the real-data workflow once, at realistic shapes, on fabricated data —
# so the first day with actual ScanNet bytes is execution, not
# integration. Stages (timed individually, wall-clock seconds):
#
#   fabricate  synthetic renders packed into REAL .sens containers
#              (640x480, 60 frames/scene, 3 scenes) + scene txt metadata
#   read       scripts/read_scannet.py  (.sens -> color/depth/poses export)
#   build      scripts/build_scannet.py (export -> materialized layout)
#   prepare    gennerf_tpu.data.prepare.prepare_data (info.json + fused GT
#              at 4/8/16 cm — the reference's three-resolution protocol)
#   staging    scripts/staging.py (prepared -> node-local training copy)
#   train      scripts/train.py on the staged data (short budget)
#   predict    scripts/predict.py from the checkpoint
#   eval       both eval CLIs
#
# Usage: WORK=/tmp/lifecycle job_scripts/full_lifecycle.sh
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${WORK:-/tmp/lifecycle}"
EPOCHS="${EPOCHS:-40}"
# ACCEL=cpu runs every stage CPU-forced (integration proof while the chip
# is busy); unset leaves the platform to each CLI's default (TPU when free)
if [ "${ACCEL:-}" = "cpu" ]; then
  export JAX_PLATFORMS=cpu
  ACCEL_OVERRIDE="trainer.accelerator=cpu"
  EVAL_CPU="--cpu"
else
  ACCEL_OVERRIDE=""
  EVAL_CPU=""
fi
cd "$REPO"
mkdir -p "$WORK"

declare -A STAGE_S
tstart() { T0=$(date +%s); }
tend() { STAGE_S[$1]=$(( $(date +%s) - T0 )); echo "--- $1: ${STAGE_S[$1]}s (rc=$2)"; }

tstart
python - <<PY > "$WORK/fabricate.log" 2>&1
import jax; jax.config.update("jax_platforms", "cpu")
import sys, os; sys.path.insert(0, "$REPO")
import numpy as np
from gennerf_tpu.data.prepare.sensor_data import SensorData
from gennerf_tpu.data.synthetic import look_at_pose, render_scene

raw = os.path.join("$WORK", "raw")
H, W, T = 480, 640, 60
K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
specs = [("scene9991_00", (0.0, 0.0, 0.5), 0.5),
         ("scene9992_00", (0.4, -0.3, 0.4), 0.4),
         ("scene9993_00", (-0.3, 0.4, 0.6), 0.55)]
for name, center, radius in specs:
    d = os.path.join(raw, "scans", name)
    os.makedirs(d, exist_ok=True)
    depths, colors, poses = [], [], []
    for i in range(T):
        a = 2 * np.pi * i / T
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3],
                            list(center))
        dep, col = render_scene(H, W, K, pose, sphere_center=center,
                                sphere_radius=radius)
        depths.append((np.asarray(dep) * 1000).astype(np.uint16))
        colors.append(np.asarray(col))
        poses.append(pose)
    SensorData.write(os.path.join(d, name + ".sens"), K,
                     np.stack(depths), np.stack(colors), np.stack(poses))
    print("fabricated", name)
PY
tend fabricate $?

tstart
python scripts/read_scannet.py --path "$WORK/raw" --output "$WORK/export" \
  --workers 2 > "$WORK/read.log" 2>&1
tend read $?

tstart
python scripts/build_scannet.py --source "$WORK/export" \
  --target "$WORK/meta" --workers 2 > "$WORK/build.log" 2>&1
tend build $?

tstart
python -m gennerf_tpu.data.prepare.prepare_data --path "$WORK/export" \
  --path_meta "$WORK/meta" --verbose 1 > "$WORK/prepare.log" 2>&1
tend prepare $?

# split list for the fabricated scenes (the official scannetv2 lists only
# name real ScanNet scene ids, so prepare's split step skips ours)
ls "$WORK"/meta/scans/ | sed "s|^|$WORK/meta/scans/|;s|$|/info.json|" \
  > "$WORK/meta/fab_all.txt"

tstart
python scripts/staging.py --splits "$WORK/meta/fab_all.txt" \
  --source "$WORK/meta" --target "$WORK/staged" --workers 2 \
  > "$WORK/staging.log" 2>&1
tend staging $?

# split files for the datamodule: absolute info.json paths work as-is
ls "$WORK"/staged/scans/ | sed 's|^|scans/|;s|$|/info.json|' \
  > "$WORK/staged/train.txt"
tail -1 "$WORK/staged/train.txt" > "$WORK/staged/val.txt"
head -2 "$WORK/staged/train.txt" > "$WORK/staged/train2.txt"

tstart
python scripts/train.py experiment=seqs_multigeo_4cm \
  "paths.data_dir=$WORK/staged" "paths.output_dir=$WORK/run" \
  "data.datasets_train=[train2.txt]" "data.datasets_val=[val.txt]" \
  "data.datasets_test=[val.txt]" \
  trainer.min_epochs=$EPOCHS trainer.max_epochs=$EPOCHS \
  trainer.check_val_every_n_epoch=10 logger=csv $ACCEL_OVERRIDE \
  > "$WORK/train.log" 2>&1
tend train $?

tstart
python scripts/predict.py "ckpt_path=$WORK/run/checkpoints" \
  "paths.data_dir=$WORK/staged" "paths.output_dir=$WORK/pred" \
  "data.datasets_test=[val.txt]" "data.dataset_type=scenes" \
  "data.num_frames_test=8" "data.voxel_size=0.04" \
  "data.voxel_dim_test=[96,96,56]" "data.voxel_types=[tsdf]" $ACCEL_OVERRIDE \
  > "$WORK/predict.log" 2>&1
tend predict $?

tstart
python -m gennerf_tpu.eval.evaluation --results "$WORK/pred" \
  --dataset "$WORK/staged/val.txt" --data-dir "$WORK/staged" $EVAL_CPU \
  > "$WORK/eval.log" 2>&1
rc=$?
python -m gennerf_tpu.eval.evaluation_tsdf --results "$WORK/pred" \
  --dataset "$WORK/staged/val.txt" --data-dir "$WORK/staged" $EVAL_CPU \
  > "$WORK/eval_tsdf.log" 2>&1
tend eval $(( rc + $? ))

echo "=== LIFECYCLE WALL-CLOCK (s) ==="
for k in fabricate read build prepare staging train predict eval; do
  echo "$k ${STAGE_S[$k]:-?}"
done
grep -E '^mean' "$WORK/eval.log" || true
