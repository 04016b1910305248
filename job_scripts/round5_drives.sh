#!/bin/bash
# Round-5 TPU drive queue (VERDICT round-4 "next" items). Differences from
# round4_drives.sh, per VERDICT next #6 (resume-aware, harvest-complete):
#   * train stages RESUME from the preemption checkpoint on timeout
#     (rc=124) instead of abandoning the run;
#   * predict/eval/harvest ALWAYS run after training, labeled with the
#     restored epoch (partial results are results);
#   * every stage appends its evidence to drive_logs/round5_harvest.md in
#     the REPO (round-4 stranded its results in /tmp and lost them).
# Stages can be cherry-picked: job_scripts/round5_drives.sh [stage ...]
#   distill   re-drive render-distillation with the gt_warmstart fix (#2)
#   spatial   spatial+pointnet multigeo quality drive, resumable (#1a)
#   eikonal   full-budget 500-epoch eikonal drive + mesh + eval (#3)
#   flagship  re-baseline seqs_multigeo_4cm under the GT-placed protocol (#7)
#   batch     B-scaling incl. B=4 bisect, B=12, voxelnet remat,
#             mitigated spatial rows (#1b, #5)
#   gradprof  gradient-loss step-cost decomposition (#3 tail)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${WORK:-/tmp}"
HARVEST="$REPO/drive_logs/round5_harvest.md"
mkdir -p "$REPO/drive_logs"
cd "$REPO"

note() { echo "$@" | tee -a "$HARVEST"; }
harvest_file() {  # harvest_file <label> <path> [tail_lines]
  local n="${3:-60}"
  { echo; echo "### $1"; echo '```'; tail -n "$n" "$2" 2>/dev/null; echo '```'; } >> "$HARVEST"
}

# train_resumable <name> <out_dir> <per_try_timeout_s> <max_tries> <train args...>
# Runs scripts/train.py; on rc=124 re-invokes with ckpt_path=<out>/checkpoints
# (the preemption checkpoint machinery, train.py:116). Always returns 0 so the
# predict/eval half runs; the final rc and completed epochs go to the harvest.
train_resumable() {
  local name="$1" out="$2" cap="$3" tries="$4"; shift 4
  local rc=0 try=1
  while : ; do
    local log="$WORK/${name}_train_try${try}.log"
    if [ "$try" -eq 1 ]; then
      timeout "$cap" python scripts/train.py "$@" "paths.output_dir=$out" > "$log" 2>&1
    else
      timeout "$cap" python scripts/train.py "$@" "paths.output_dir=$out" \
        "ckpt_path=$out/checkpoints" > "$log" 2>&1
    fi
    rc=$?
    local last_epoch
    last_epoch=$(grep -oE "^.*epoch ([0-9]+):" "$log" | grep -oE "epoch [0-9]+" | tail -1)
    note "[$name] try $try rc=$rc (${last_epoch:-no epochs logged})"
    # resume on timeout (124) AND on host OOM-kill (137): the axon client
    # leaks ~40 MB of host RSS per step, so multi-hundred-epoch drives
    # get OOM-killed around epoch ~380 — the every-epoch checkpoint +
    # resume machinery absorbs both
    { [ $rc -ne 124 ] && [ $rc -ne 137 ]; } && break
    try=$((try + 1))
    [ $try -gt "$tries" ] && { note "[$name] gave up after $tries tries (still rc=124)"; break; }
    note "[$name] timed out; resuming from $out/checkpoints (try $try)"
  done
  cat "$WORK/${name}"_train_try*.log > "$WORK/${name}_train.log" 2>/dev/null
  return 0
}

# predict_eval <name> <run_dir> <data_dir> [extra predict overrides...]
# GT-placed protocol (round-4 placement convention): the predict loader
# carries the GT tsdf volume for grid PLACEMENT only; reconstruction stays
# frame-only. Always runs, even on a partial checkpoint.
predict_eval() {
  local name="$1" out="$2" data="$3"; shift 3
  timeout 2700 python scripts/predict.py "ckpt_path=$out/checkpoints" \
    "paths.data_dir=$data" "paths.output_dir=${out}_pred" \
    "data.datasets_test=[val.txt]" "data.dataset_type=scenes" \
    "data.num_frames_test=8" "data.voxel_size=0.04" \
    "data.voxel_dim_test=[96,96,56]" "data.voxel_types=[tsdf]" "$@" \
    > "$WORK/${name}_predict.log" 2>&1
  note "[$name] predict rc=$? $(grep -coE '[0-9]+ vertices' "$WORK/${name}_predict.log" || true) meshes"
  timeout 3600 python -m gennerf_tpu.eval.evaluation \
    --results "${out}_pred" --dataset "$data/val.txt" \
    --data-dir "$data" > "$WORK/${name}_eval.log" 2>&1
  note "[$name] eval rc=$?"
  timeout 1800 python -m gennerf_tpu.eval.evaluation_tsdf \
    --results "${out}_pred" --dataset "$data/val.txt" \
    --data-dir "$data" > "$WORK/${name}_eval_tsdf.log" 2>&1
  note "[$name] eval_tsdf rc=$?"
  harvest_file "$name predict tail" "$WORK/${name}_predict.log" 25
  harvest_file "$name eval" "$WORK/${name}_eval.log" 80
  harvest_file "$name eval_tsdf" "$WORK/${name}_eval_tsdf.log" 40
}

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

echo "## round-5 drive queue $(date -u)" >> "$HARVEST"

# order: short fix-validation first, then the highest-VERDICT-value long
# drive (spatial), bounded bench stages, the eikonal budget drive, the
# cheap profiling, and the lowest-priority re-baseline last (it is the
# one to lose if the wall clock runs out)
for STAGE in distill spatial batch eikonal gradprof flagship; do
  want "$@" || continue
  note "=== stage $STAGE ($(date -u +%H:%M:%S)) ==="
  case "$STAGE" in
    distill)
      # re-drive with the gt_warmstart fix + distill_coverage scalar
      # (VERDICT next #2: the round-4 drive's distill loss was 0.0 for
      # 59/60 epochs — dead ok&hit mask, undetected)
      if [ ! -f "$WORK/synth1/scans/scene_synth0/info.json" ]; then
        python - <<'PY' > "$WORK/synth1.gen.log" 2>&1
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, ".")
from gennerf_tpu.data.synthetic import generate_scene
generate_scene("/tmp/synth1", scene="scene_synth0", num_frames=24)
PY
      fi
      train_resumable distill "$WORK/distill_run" 5400 2 \
        experiment=distill_render_synthetic trainer=tpu \
        trainer.min_epochs=60 trainer.max_epochs=60 \
        "paths.data_dir=$WORK/synth1" logger=csv
      # the drive's verdict in-band: distill loss + coverage trajectory
      python - <<'PY' >> "$HARVEST" 2>&1
import csv
rows = list(csv.DictReader(open("/tmp/distill_run/csv/metrics.csv")))
print("\n### distill loss/coverage trajectory (every 10th epoch)")
seen = {}
for r in rows:
    e = r.get("epoch")
    if e and r.get("train_distill"):
        seen[int(float(e))] = (r.get("train_distill"), r.get("train_distill_coverage"), r.get("train_render_hit_rate"))
for e in sorted(seen):
    if e % 10 == 0 or e == max(seen):
        d, c, h = seen[e]
        print(f"epoch {e}: distill={d} coverage={c} hit_rate={h}")
PY
      timeout 1800 python scripts/local/render_views.py \
        --ckpt "$WORK/distill_run/checkpoints" --features \
        --data-dir "$WORK/synth1" --dataset scans/scene_synth0/info.json \
        --out "$WORK/distill_run/feature_views" \
        > "$WORK/distill_render.log" 2>&1
      note "[distill] feature render rc=$?"
      harvest_file "distill render tail" "$WORK/distill_render.log" 15 ;;
    spatial)
      ensure_multigeo || continue
      python scripts/port_weights.py backbone random:resnet34 \
        "$WORK/resnet34_fab.npz" --num-stages 3 \
        > "$WORK/spatial_port.log" 2>&1 || continue
      # matched-budget A/B vs the 120-epoch pointnet-only probe (F 0.895)
      train_resumable spatial "$WORK/spatial_run" 10800 3 \
        experiment=seqs_multigeo_spatial trainer=tpu \
        "paths.data_dir=$WORK/multigeo" \
        trainer.min_epochs=120 trainer.max_epochs=120 \
        "model.encoder.spatial.pretrained_path=$WORK/resnet34_fab.npz" \
        logger=csv
      predict_eval spatial "$WORK/spatial_run" "$WORK/multigeo" ;;
    eikonal)
      ensure_multigeo || continue
      # FULL budget (the 500-epoch recipe that reaches F 0.94 on the
      # tsdf-only arm; round-4's 150-epoch attempt died at the queue cap
      # inside the saturation cliff, VERDICT next #3)
      train_resumable eikonal "$WORK/eikonal_run" 7200 4 \
        experiment=seqs_multigeo_4cm trainer=tpu \
        "paths.data_dir=$WORK/multigeo" \
        trainer.min_epochs=500 trainer.max_epochs=500 \
        model.loss.use_eikonal=true model.loss.eikonal.weight=0.01 \
        logger=csv
      predict_eval eikonal "$WORK/eikonal_run" "$WORK/multigeo" ;;
    flagship)
      ensure_multigeo || continue
      # one-protocol re-baseline (VERDICT next #7): the round-3 F 0.936 was
      # GT-less placement; re-run the flagship at 500 epochs and eval under
      # the round-4 GT-placed convention so the 0.956/0.904 family of
      # numbers shares one protocol
      train_resumable flagship "$WORK/flagship_run" 7200 4 \
        experiment=seqs_multigeo_4cm trainer=tpu \
        "paths.data_dir=$WORK/multigeo" \
        trainer.min_epochs=500 trainer.max_epochs=500 logger=csv
      predict_eval flagship "$WORK/flagship_run" "$WORK/multigeo" ;;
    batch)
      # (a) pointnet B-scaling through the reference global batch 12, incl.
      # the deterministic-B=4-compile-crash bisect shapes (B=3/5 bracket it)
      timeout 3600 python scripts/local/bench_batch_scaling.py \
        --models pointnet --batches 3,4,5,12 > "$WORK/r5_batch_pointnet.log" 2>&1
      note "[batch] pointnet rc=$?"
      harvest_file "batch pointnet (B=3,4,5,12)" "$WORK/r5_batch_pointnet.log" 20
      # (b) voxelnet per-chip remat mitigation row (never successfully run)
      timeout 3000 python scripts/local/bench_batch_scaling.py \
        --models voxelnet --batches 1,2 --remat \
        > "$WORK/r5_batch_voxelnet_remat.log" 2>&1
      note "[batch] voxelnet remat rc=$?"
      harvest_file "batch voxelnet remat" "$WORK/r5_batch_voxelnet_remat.log" 15
      # (c) mitigated spatial rows at reference resolution: the reference's
      # own levers (channel-reduce 1x1 + scan-over-T chunked encode), which
      # round 4 promised and never produced (VERDICT missing #1)
      timeout 3600 python scripts/local/bench_batch_scaling.py \
        --models spatial --batches 1 --remat --precision bf16-mixed \
        --override model.encoder.spatial.out_channels=64 \
        --override model.encoder.spatial.frame_chunk=1 \
        > "$WORK/r5_batch_spatial_mitigated.log" 2>&1
      note "[batch] spatial mitigated (out_channels=64 frame_chunk=1) rc=$?"
      harvest_file "batch spatial mitigated" "$WORK/r5_batch_spatial_mitigated.log" 15
      # (d) chunked-encode-only variant (keep full 512-ch latent)
      timeout 3600 python scripts/local/bench_batch_scaling.py \
        --models spatial --batches 1 --remat --precision bf16-mixed \
        --override model.encoder.spatial.frame_chunk=1 \
        > "$WORK/r5_batch_spatial_chunkonly.log" 2>&1
      note "[batch] spatial chunk-only rc=$?"
      harvest_file "batch spatial chunk-only" "$WORK/r5_batch_spatial_chunkonly.log" 15 ;;
    gradprof)
      # why is gradient mode 7x the base step (120.9 vs 17.4 ms, round-4
      # measurement)? full decomposition: the sampling row includes the
      # full-map normals estimation + validity top-k
      timeout 2400 python scripts/local/profile_train_step.py \
        --loss gradient > "$WORK/r5_step_gradient.log" 2>&1
      note "[gradprof] gradient rc=$?"
      timeout 2400 python scripts/local/profile_train_step.py \
        > "$WORK/r5_step_tsdf_decomp.log" 2>&1
      note "[gradprof] tsdf baseline rc=$?"
      harvest_file "gradient step decomposition" "$WORK/r5_step_gradient.log" 30
      harvest_file "tsdf step decomposition" "$WORK/r5_step_tsdf_decomp.log" 30 ;;
  esac
done
note "ROUND5 DRIVES DONE $(date -u)"
