"""End-to-end CLI integration for the SECOND model family: VoxelNet
(reference src/models/voxel_net.py) driven through the real training CLI on
the synthetic fixture with multi-scale GT volumes — the Atlas-style dense
path (spatial encoder -> backproject accumulate -> 3D encoder-decoder ->
multi-scale TSDF heads). Complements tests/test_train_e2e.py, which covers
the GenNerf CLI path only."""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    from gennerf_tpu.data.synthetic import generate_scene

    root = tmp_path_factory.mktemp("synth_vn")
    info_path = generate_scene(str(root), num_frames=12, H=48, W=64,
                               voxel_sizes=(8, 16))
    return str(root), info_path


@pytest.mark.slow
class TestVoxelNetCli:
    def test_train_cli_voxelnet_multiscale(self, synth_data, tmp_path):
        """Drive scripts/train.py with the seqs_multigeo_voxelnet preset
        scaled down for CI: loss must descend and the multi-scale recon
        tail + checkpoints must be written."""
        root, _ = synth_data
        import train as train_cli

        out = str(tmp_path / "run")
        metrics = train_cli.main([
            "experiment=seqs_multigeo_voxelnet",
            f"paths.data_dir={root}",
            f"paths.output_dir={out}",
            "trainer.max_epochs=6", "trainer.min_epochs=6",
            "trainer.check_val_every_n_epoch=3",
            "trainer.num_sanity_val_steps=0",
            # preset batch_size=1 can't shard over the 8-device test mesh
            "trainer.devices=1",
            # small shapes for CI speed
            "data.datasets_train=[scans/scene_synth0/info.json]",
            "data.datasets_val=[scans/scene_synth0/info.json]",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            # 12-frame fixture: length 6 -> int(0.8*12/6)=1 window/epoch
            "data.sequence_length=6",
            "data.num_frames_train=3", "data.num_frames_val=3",
            "data.num_frames_test=3",
            "data.voxel_size=0.08",
            "data.voxel_dim_train=[40,40,20]",
            "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]",
            "data.random_rotation_3d=false",
            "data.random_translation_3d=false",
            "model.encoder.spatial.num_layers=2",
            "model.encoder.spatial.feature_scale=0.5",
            # 3 pyramid levels -> 2 head scales = 8+16cm (fixture GT sizes)
            "model.backbone3d.channels=[8,16,24]",
            "model.backbone3d.layers=[1,1]",
        ])
        assert any(k.startswith("train_") for k in metrics)
        jsonl = os.path.join(out, "csv", "metrics.jsonl")
        rows = [json.loads(l) for l in open(jsonl)]
        train_rows = [r["train_tsdf_loss"] for r in rows if "train_tsdf_loss" in r]
        assert len(train_rows) >= 6
        assert all(np.isfinite(v) for v in train_rows)
        # BOTH head scales supervised (multi-scale TSDFHead,
        # reference heads3d.py:101-171)
        scale_rows = [r for r in rows if "train_vol_08_tsdf_loss" in r]
        assert scale_rows and all("train_vol_16_tsdf_loss" in r for r in scale_rows)
        # the dense conv model overfits the fixed scene: descent, leniently
        first = np.mean(train_rows[:2])
        last = np.mean(train_rows[-2:])
        assert last < first, (first, last)
        # multi-scale recon artifacts from the val tail
        local = os.path.join(out, "local")
        assert os.path.exists(os.path.join(local, "val_tsdf", "val_pred_tsdf.npz"))
        # monitored checkpointing (preset sets monitor=val_combined)
        assert os.path.isdir(os.path.join(out, "checkpoints"))
