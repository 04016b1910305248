#!/bin/bash
# Round-4 TPU drive queue (VERDICT round-3 "next" items 2-7): benches and
# quality drives that need the single chip, run sequentially. Stages can be
# cherry-picked: job_scripts/round4_drives.sh [stage ...]
#   bench     bench.py sanity + renderer re-bench (AABB-clipped marcher)
#   scale     reference-default 22.2M-pt decode + sparse-band timing (#3)
#   batch     batch-scaling + HBM envelope across model configs (#4)
#   smoothing 120-epoch half-budget A/B: head_smoothing 1.0 vs 1.05 (#6)
#   eikonal   eikonal step-cost A/B + flagship-shape convergence drive (#5)
#   distill   render-distillation drive + feature-image artifact (#7)
#   spatial   spatial+pointnet multigeo quality drive, LONG (#2)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${WORK:-/tmp}"
cd "$REPO"

ensure_multigeo() {
  [ -f "$WORK/multigeo/val.txt" ] && return 0
  python scripts/local/make_multigeo_dataset.py --out "$WORK/multigeo" --train 8 \
    > "$WORK/multigeo.gen.log" 2>&1 && [ -f "$WORK/multigeo/val.txt" ]
}

want() {
  [ $# -eq 0 ] && return 0
  local d; for d in "$@"; do [ "$d" = "$STAGE" ] && return 0; done
  return 1
}

for STAGE in bench scale batch smoothing eikonal distill spatial; do
  want "$@" || continue
  echo "=== stage $STAGE ($(date -u +%H:%M:%S)) ==="
  case "$STAGE" in
    bench)
      timeout 1800 python bench.py > "$WORK/r4_bench.log" 2>&1
      echo "bench rc=$?"
      timeout 1800 python scripts/local/bench_points_decode.py \
        > "$WORK/r4_renderer.log" 2>&1
      echo "renderer rc=$?" ;;
    scale)
      # one grid per invocation: each kernel shape is a fresh Mosaic compile
      timeout 2400 python scripts/local/bench_decode_scale.py \
        --dims 416,416,128 --sparse > "$WORK/r4_scale_ref.log" 2>&1
      echo "scale ref-dims rc=$?"
      timeout 1800 python scripts/local/bench_decode_scale.py \
        --dims 256,256,96 --sparse > "$WORK/r4_scale_flagship.log" 2>&1
      echo "scale flagship rc=$?" ;;
    batch)
      timeout 3000 python scripts/local/bench_batch_scaling.py \
        --models pointnet --batches 1,2,4,8 > "$WORK/r4_batch_pointnet.log" 2>&1
      echo "batch pointnet rc=$?"
      timeout 3600 python scripts/local/bench_batch_scaling.py \
        --models spatial,pointnet_spatial --batches 1,2 \
        > "$WORK/r4_batch_spatial.log" 2>&1
      echo "batch spatial rc=$?"
      timeout 3000 python scripts/local/bench_batch_scaling.py \
        --models voxelnet --batches 1,2,4 > "$WORK/r4_batch_voxelnet.log" 2>&1
      echo "batch voxelnet rc=$?" ;;
    smoothing)
      ensure_multigeo || continue
      for s in 1.0 1.05; do
        out="$WORK/smooth_${s}_run"
        timeout 4000 python scripts/train.py experiment=seqs_multigeo_4cm \
          "paths.data_dir=$WORK/multigeo" "paths.output_dir=$out" \
          trainer.min_epochs=120 trainer.max_epochs=120 \
          "model.mlp.head_smoothing=$s" logger=csv \
          > "$WORK/smooth_${s}_train.log" 2>&1
        echo "smoothing=$s train rc=$?"
        timeout 2400 python scripts/predict.py "ckpt_path=$out/checkpoints" \
          "paths.data_dir=$WORK/multigeo" "paths.output_dir=${out}_pred" \
          "data.datasets_test=[val.txt]" "data.dataset_type=scenes" \
          "data.num_frames_test=8" "data.voxel_size=0.04" \
          "data.voxel_dim_test=[96,96,56]" "data.voxel_types=[tsdf]" \
          > "$WORK/smooth_${s}_predict.log" 2>&1
        echo "smoothing=$s predict rc=$? (vertex counts:)"
        grep -oE "[0-9]+ vertices" "$WORK/smooth_${s}_predict.log" || true
        timeout 2400 python -m gennerf_tpu.eval.evaluation \
          --results "${out}_pred" --dataset "$WORK/multigeo/val.txt" \
          --data-dir "$WORK/multigeo" --cpu \
          > "$WORK/smooth_${s}_eval.log" 2>&1
        echo "smoothing=$s eval rc=$?"
      done ;;
    eikonal)
      # step-cost A/B at flagship shapes (chained methodology)
      timeout 2400 python scripts/local/profile_train_step.py --step-only \
        > "$WORK/r4_step_tsdf.log" 2>&1
      echo "step tsdf rc=$?"
      timeout 2400 python scripts/local/profile_train_step.py --step-only \
        --loss eikonal > "$WORK/r4_step_eikonal.log" 2>&1
      echo "step eikonal rc=$?"
      timeout 2400 python scripts/local/profile_train_step.py --step-only \
        --loss gradient > "$WORK/r4_step_gradient.log" 2>&1
      echo "step gradient rc=$?"
      timeout 2400 python scripts/local/profile_train_step.py --step-only \
        --loss distill > "$WORK/r4_step_distill.log" 2>&1
      echo "step distill rc=$?"
      ensure_multigeo || continue
      timeout 7200 python scripts/train.py experiment=seqs_multigeo_4cm \
        "paths.data_dir=$WORK/multigeo" "paths.output_dir=$WORK/eikonal_run" \
        trainer.min_epochs=150 trainer.max_epochs=150 \
        model.loss.use_eikonal=true model.loss.eikonal.weight=0.01 \
        logger=csv > "$WORK/eikonal_train.log" 2>&1
      echo "eikonal train rc=$?" ;;
    distill)
      # built-in synthetic scene, generated in a CPU-forced subprocess
      # (generate_scene runs eagerly; per-op dispatch through the tunnel
      # takes >15 min — verify-skill note)
      if [ ! -f "$WORK/synth1/scans/scene_synth0/info.json" ]; then
        python - <<'PY' > "$WORK/synth1.gen.log" 2>&1
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, ".")
from gennerf_tpu.data.synthetic import generate_scene
generate_scene("/tmp/synth1", scene="scene_synth0", num_frames=24)
PY
      fi
      timeout 5400 python scripts/train.py experiment=distill_render_synthetic \
        trainer=tpu trainer.min_epochs=60 trainer.max_epochs=60 \
        "paths.data_dir=$WORK/synth1" \
        "paths.output_dir=$WORK/distill_run" logger=csv \
        > "$WORK/distill_train.log" 2>&1
      echo "distill train rc=$?"
      timeout 1800 python scripts/local/render_views.py \
        --ckpt "$WORK/distill_run/checkpoints" --features \
        --data-dir "$WORK/synth1" --dataset scans/scene_synth0/info.json \
        --out "$WORK/distill_run/feature_views" \
        > "$WORK/distill_render.log" 2>&1
      echo "distill render rc=$?" ;;
    spatial)
      ensure_multigeo || continue
      # matched-budget A/B against the half-budget pointnet-only probe
      # (BENCH.md round 4: 120 epochs, F@5cm 0.895) — same data/budget/
      # schedule, only the encoder adds the spatial path. The fabricated
      # random:resnet34 graft exercises the pretrained-weight path end to
      # end (no ImageNet bytes exist in this environment).
      python scripts/port_weights.py backbone random:resnet34 \
        "$WORK/resnet34_fab.npz" --num-stages 3 \
        > "$WORK/spatial_port.log" 2>&1 || continue
      timeout 14400 python scripts/train.py experiment=seqs_multigeo_spatial \
        "paths.data_dir=$WORK/multigeo" "paths.output_dir=$WORK/spatial_run" \
        trainer.min_epochs=120 trainer.max_epochs=120 \
        "model.encoder.spatial.pretrained_path=$WORK/resnet34_fab.npz" \
        logger=csv > "$WORK/spatial_train.log" 2>&1
      echo "spatial train rc=$?"
      timeout 2400 python scripts/predict.py \
        "ckpt_path=$WORK/spatial_run/checkpoints" \
        "paths.data_dir=$WORK/multigeo" "paths.output_dir=$WORK/spatial_pred" \
        "data.datasets_test=[val.txt]" "data.dataset_type=scenes" \
        "data.num_frames_test=8" "data.voxel_size=0.04" \
        "data.voxel_dim_test=[96,96,56]" "data.voxel_types=[tsdf]" \
        > "$WORK/spatial_predict.log" 2>&1
      echo "spatial predict rc=$?"
      timeout 3600 python -m gennerf_tpu.eval.evaluation \
        --results "$WORK/spatial_pred" --dataset "$WORK/multigeo/val.txt" \
        --data-dir "$WORK/multigeo" > "$WORK/spatial_eval.log" 2>&1
      echo "spatial eval rc=$?"
      timeout 1800 python -m gennerf_tpu.eval.evaluation_tsdf \
        --results "$WORK/spatial_pred" --dataset "$WORK/multigeo/val.txt" \
        --data-dir "$WORK/multigeo" > "$WORK/spatial_eval_tsdf.log" 2>&1
      echo "spatial eval_tsdf rc=$?" ;;
  esac
done
echo "ROUND4 DRIVES DONE $(date -u)"
