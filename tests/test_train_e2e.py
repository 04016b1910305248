"""End-to-end integration: synthetic scene -> data pipeline -> GenNerf
pointnet-only training via the real CLI surface -> loss decreases ->
reconstruction artifacts written. This is the reference's overfit-fixture
test strategy (SURVEY §4) made automatic."""
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

    root = tmp_path_factory.mktemp("synth")
    info_path = generate_scene(str(root), num_frames=12, H=48, W=64,
                               voxel_sizes=(4, 8, 16))
    return str(root), info_path


class TestSyntheticData:
    def test_layout_matches_reference_format(self, synth_data):
        root, info_path = synth_data
        info = json.load(open(info_path))
        assert {"dataset", "scene", "frames", "file_name_vol_04"} <= set(info)
        assert len(info["frames"]) == 12
        f0 = info["frames"][0]
        assert {"file_name_image", "file_name_depth", "intrinsics", "pose"} <= set(f0)
        # GT volume loads through the TSDF npz contract
        from gennerf_tpu.tsdf import TSDF

        t = TSDF.load(info["file_name_vol_04"])
        assert t.voxel_size == pytest.approx(0.04)
        vol = np.asarray(t.tsdf_vol)
        assert (vol < 0).any() and (vol > 0).any()

    def test_datamodule_batch_shapes(self, synth_data):
        root, info_path = synth_data
        from gennerf_tpu.data.datamodule import ScannetDataModule

        cfg = {
            "data_dir": root,
            "datasets_train": ["scans/scene_synth0/info.json"],
            "datasets_val": ["scans/scene_synth0/info.json"],
            "datasets_test": ["scans/scene_synth0/info.json"],
            "dataset_type": "sequences",
            "sequence_amount_train": 1.0, "sequence_amount_val": 1.0,
            "sequence_amount_test": 1.0,
            "sequence_length": 12, "sequence_locations": "free",
            "sequence_order": "random",
            "num_frames_train": 4, "num_frames_val": 4, "num_frames_test": 4,
            "frame_locations": "evenly_spaced", "frame_order": "random",
            "batch_size": 1, "voxel_size": 0.08,
            "voxel_dim_train": [40, 40, 20], "voxel_dim_val": [40, 40, 20],
            "voxel_dim_test": [40, 40, 20],
            "voxel_types": ["tsdf"], "from_archive": False,
        }
        dm = ScannetDataModule(cfg)
        batch = next(iter(dm.train_dataloader()))
        assert batch["image"].shape == (1, 4, 3, 480, 640)
        assert batch["depth"].shape == (1, 4, 480, 640)
        assert batch["projection"].shape == (1, 4, 3, 4)
        assert batch["pose"].shape == (1, 4, 4, 4)
        assert batch["intrinsics"].shape == (1, 4, 3, 3)
        assert batch["vol_08_tsdf"].shape == (1, 1, 40, 40, 20)
        # depth is metric and mostly valid
        assert 0.5 < batch["depth"][batch["depth"] > 0].mean() < 5.0

    def test_projection_consistency(self, synth_data):
        """Unprojecting the resized depth through the batch projection must
        land points near the known scene geometry (sphere+floor box)."""
        root, info_path = synth_data
        import jax.numpy as jnp

        from gennerf_tpu import ops
        from gennerf_tpu.data.datamodule import ScannetDataModule

        cfg = {
            "data_dir": root,
            "datasets_train": ["scans/scene_synth0/info.json"],
            "datasets_val": ["scans/scene_synth0/info.json"],
            "datasets_test": ["scans/scene_synth0/info.json"],
            "dataset_type": "frame", "frame_idx": 0,
            "length_train": 1, "length_val": 1, "length_test": 1,
            "batch_size": 1, "voxel_size": 0.08,
            "voxel_dim_train": [40, 40, 20], "voxel_dim_val": [40, 40, 20],
            "voxel_dim_test": [40, 40, 20],
            "voxel_types": ["tsdf"], "from_archive": False,
        }
        dm = ScannetDataModule(cfg)
        batch = next(iter(dm.train_dataloader()))
        depth = jnp.asarray(batch["depth"][0])  # (1, H, W)
        proj = jnp.asarray(batch["projection"][0])
        pts = np.asarray(ops.get_3d_points(depth, proj))[0]  # (H, W, 3)
        d = np.asarray(depth[0])
        H, W = d.shape
        # reproject: every valid point must land back on its own pixel
        hom = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
        cam = np.einsum("ij,hwj->hwi", np.asarray(proj[0], np.float64), hom.astype(np.float64))
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        mask = d > 0
        u_err = np.abs(cam[..., 0] / cam[..., 2] - uu)[mask]
        v_err = np.abs(cam[..., 1] / cam[..., 2] - vv)[mask]
        assert np.median(u_err) < 0.5 and np.median(v_err) < 0.5
        np.testing.assert_allclose(cam[..., 2][mask], d[mask], rtol=5e-2)


@pytest.mark.slow
class TestOverfitTraining:
    def test_train_cli_overfit_and_reconstruct(self, synth_data, tmp_path):
        """Drive the real training CLI on the synthetic scene."""
        root, _ = synth_data
        import train as train_cli

        out = str(tmp_path / "run")
        metrics = train_cli.main([
            "experiment=overfit_synthetic",
            "data=frame",  # single-frame overfit fixture (reference FrameDataset)
            f"paths.data_dir={root}",
            f"paths.output_dir={out}",
            "trainer.max_epochs=8",
            "trainer.check_val_every_n_epoch=4",
            "trainer.num_sanity_val_steps=0",
            # small shapes for CI speed
            "data.datasets_train=[scans/scene_synth0/info.json]",
            "data.datasets_val=[scans/scene_synth0/info.json]",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.frame_idx=0",
            "data.length_train=4",
            "data.length_val=1",
            "data.voxel_dim_train=[40,40,20]",
            "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
            "model.encoder.pointnet.plane_resolution=32",
            "model.encoder.pointnet.num_sparse_points=128",
            "model.mlp.d_hidden=128",
            "model.ray.num_rays=32",
            "model.optimizer.lr=0.001",
        ])
        assert "train_loss" in metrics or "train_combined" in metrics
        # loss went down over training
        jsonl = os.path.join(out, "csv", "metrics.jsonl")
        rows = [json.loads(l) for l in open(jsonl)]
        train_rows = [r["train_combined"] for r in rows if "train_combined" in r]
        assert len(train_rows) >= 10
        # supervision points are resampled every step, and with smooth_log
        # targets the loss floor (~0.06 for this scene) is close to some
        # inits — assert convergence-to-floor / no divergence rather than a
        # fixed relative decrease (optimizer descent itself is asserted by
        # the distillation test). A broken step diverges to ~1.2 (saturated
        # tanh) or sticks above 0.1.
        first = np.mean(train_rows[:4])
        last = np.mean(train_rows[-4:])
        assert last < max(first * 0.9, 0.08), (first, last)
        # reconstruction artifacts written
        local = os.path.join(out, "local")
        assert os.path.exists(os.path.join(local, "val_tsdf", "val_pred_tsdf.npz"))
        assert os.path.exists(os.path.join(local, "val_mesh", "val_trgt_mesh.ply"))
        # checkpoints saved
        assert os.path.isdir(os.path.join(out, "checkpoints"))


@pytest.mark.slow
class TestPredictCli:
    def test_predict_gtless_scene_exports_npz_and_ply(self, synth_data, tmp_path):
        """Train briefly, strip the GT volumes from the scene (the reference's
        scans_test layout), and drive scripts/predict.py: it must size the
        decode volume from voxel_dim_test and export {scene}.npz + {scene}.ply
        (reference voxel_net.py:354-384)."""
        import shutil

        root, info_path = synth_data
        import predict as predict_cli
        import train as train_cli

        run = str(tmp_path / "run")
        common = [
            f"paths.data_dir={root}",
            "data.datasets_train=[scans/scene_synth0/info.json]",
            "data.datasets_val=[scans/scene_synth0/info.json]",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.voxel_dim_train=[40,40,20]",
            "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
            "model.encoder.pointnet.plane_resolution=32",
            "model.encoder.pointnet.num_sparse_points=64",
            "model.mlp.d_hidden=64",
            "model.mlp.n_blocks=2",
            "model.ray.num_rays=16",
        ]
        train_cli.main([
            "experiment=overfit_synthetic", "data=frame",
            f"paths.output_dir={run}",
            "trainer.max_epochs=1", "trainer.num_sanity_val_steps=0",
            "trainer.check_val_every_n_epoch=50",
            "data.frame_idx=0", "data.length_train=2", "data.length_val=1",
            *common,
        ])
        ckpt = os.path.join(run, "checkpoints")
        assert os.path.isdir(ckpt)

        # GT-less copy of the scene: drop the fused volumes from info.json
        gtless_root = str(tmp_path / "gtless")
        shutil.copytree(root, gtless_root)
        info_file = os.path.join(gtless_root, "scans", "scene_synth0", "info.json")
        info = json.load(open(info_file))
        for k in list(info):
            if k.startswith("file_name_vol"):
                del info[k]
        json.dump(info, open(info_file, "w"))

        out = str(tmp_path / "pred")
        predict_cli.main([
            f"ckpt_path={ckpt}",
            "trainer=cpu",  # covers predict-side select_platform (CPU inference)
            f"paths.data_dir={gtless_root}",
            f"paths.output_dir={out}",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.dataset_type=scenes",
            "data.num_frames_test=4",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
            "data.voxel_types=[]",
        ])
        assert os.path.exists(os.path.join(out, "scene_synth0.npz"))
        assert os.path.exists(os.path.join(out, "scene_synth0.ply"))
        from gennerf_tpu.tsdf import TSDF

        t = TSDF.load(os.path.join(out, "scene_synth0.npz"))
        assert np.asarray(t.tsdf_vol).shape == (40, 40, 20)


@pytest.mark.slow
class TestGeneralization:
    def test_heldout_scene_loss_drops(self, tmp_path):
        """The framework's namesake capability: train on four scenes with
        different sphere geometry, validate on an UNSEEN fifth — the
        held-out loss must drop substantially (generalizable fields, not
        memorization). Long-run evidence: 0.241 -> 0.017 (14x) over 1200
        steps (BENCH.md). The val loss sits flat (~0.24, the PE-only solution)
        until a phase transition at ~160 steps where the decoder discovers
        the encoder features, then drops sharply (0.09 at 160, 0.03 at 320)
        — this CI budget (60 epochs = 240 steps) lands safely past the
        transition; asserted at 0.6x for noise margin. Uses
        normalize_coords=true so the triplane actually carries the scene."""
        from gennerf_tpu.data.synthetic import generate_scene

        root = str(tmp_path / "scenes")
        specs = [
            ("scene_a", (0.0, 0.0, 0.5), 0.5),
            ("scene_b", (0.6, -0.4, 0.35), 0.35),
            ("scene_d", (0.3, 0.3, 0.6), 0.55),
            ("scene_e", (-0.4, -0.3, 0.4), 0.3),
            ("scene_c", (-0.5, 0.5, 0.45), 0.45),  # held out
        ]
        for i, (name, center, radius) in enumerate(specs):
            generate_scene(root, scene=name, num_frames=8, H=48, W=64,
                           voxel_sizes=(8,), sphere_center=center,
                           sphere_radius=radius, seed=i)

        import train as train_cli

        out = str(tmp_path / "run")
        train_cli.main([
            "experiment=overfit_synthetic",
            f"paths.data_dir={root}",
            f"paths.output_dir={out}",
            "trainer.max_epochs=60",
            "trainer.check_val_every_n_epoch=5",
            "trainer.num_sanity_val_steps=0",
            "data.datasets_train=[scans/scene_a/info.json,scans/scene_b/info.json,"
            "scans/scene_d/info.json,scans/scene_e/info.json]",
            "data.datasets_val=[scans/scene_c/info.json]",
            "data.datasets_test=[scans/scene_c/info.json]",
            "data.sequence_length=8",
            "data.num_frames_train=4", "data.num_frames_val=4",
            "data.num_frames_test=4",
            "data.voxel_dim_train=[40,40,20]", "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]", "data.voxel_size=0.08",
            "model.encoder.pointnet.plane_resolution=32",
            "model.encoder.pointnet.num_sparse_points=128",
            "model.mlp.d_hidden=128", "model.ray.num_rays=32",
            "model.optimizer.lr=0.001",
        ])
        jsonl = os.path.join(out, "csv", "metrics.jsonl")
        rows = [json.loads(l) for l in open(jsonl)]
        val = [r["val_combined"] for r in rows if "val_combined" in r]
        assert len(val) >= 6
        assert np.isfinite(val).all()
        # the val scene was never trained on: landing well below the
        # encoder-independent PE-only plateau (~0.24 on this setup; raw
        # coords never leave it, see BENCH.md) = generalization through
        # the triplane encoder. Absolute, not val[0]-relative: with the
        # deterministic loader the phase transition can land before the
        # first val measurement, making ratios-to-val[0] meaningless.
        assert min(val) < 0.15, (val[0], val[-1], val)
        assert val[-1] < 0.15, (val[0], val[-1], val)


@pytest.mark.slow
class TestHybridMeshCLI:
    def test_train_cli_num_slices(self, synth_data, tmp_path):
        """Drive the training CLI over the hybrid (slice, data) pod mesh
        (configs/trainer/tpu_pod.yaml surface) on the 8-device virtual
        platform: 2 slices x 4 'chips'."""
        root, _ = synth_data
        import train as train_cli

        out = str(tmp_path / "run_pod")
        metrics = train_cli.main([
            "experiment=overfit_synthetic",
            "data=frame",
            f"paths.data_dir={root}",
            f"paths.output_dir={out}",
            "trainer.devices=8",
            "trainer.num_slices=2",
            "trainer.max_epochs=2",
            "trainer.check_val_every_n_epoch=2",
            "trainer.num_sanity_val_steps=0",
            "data.datasets_train=[scans/scene_synth0/info.json]",
            "data.datasets_val=[scans/scene_synth0/info.json]",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.frame_idx=0",
            "data.length_train=8",
            "data.length_val=1",
            "data.batch_size=8",
            "data.voxel_dim_train=[40,40,20]",
            "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
            "model.encoder.pointnet.plane_resolution=32",
            "model.encoder.pointnet.num_sparse_points=64",
            "model.mlp.d_hidden=64",
            "model.ray.num_rays=16",
        ])
        val = metrics.get("train_combined", metrics.get("train_loss"))
        assert val is not None and np.isfinite(val)


@pytest.mark.slow
class TestBestCheckpointSelection:
    def test_monitored_topk_keeps_best_epoch(self, synth_data, tmp_path):
        """CLI run with a monitored ModelCheckpoint: top-1 retention keeps
        exactly the epoch with the best val_combined, and the test pass
        restores it (reference src/train.py:101-108 best_model_path)."""
        root, _ = synth_data
        import train as train_cli

        out = str(tmp_path / "run_best")
        train_cli.main([
            "experiment=overfit_synthetic",
            "data=frame",
            f"paths.data_dir={root}",
            f"paths.output_dir={out}",
            "trainer.max_epochs=4",
            "trainer.check_val_every_n_epoch=1",
            "trainer.num_sanity_val_steps=0",
            "callbacks.model_checkpoint.monitor=val_combined",
            "callbacks.model_checkpoint.save_top_k=1",
            "test=true",
            "data.datasets_train=[scans/scene_synth0/info.json]",
            "data.datasets_val=[scans/scene_synth0/info.json]",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.frame_idx=0",
            "data.length_train=4",
            "data.length_val=1",
            "data.voxel_dim_train=[40,40,20]",
            "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
            "model.encoder.pointnet.plane_resolution=32",
            "model.encoder.pointnet.num_sparse_points=128",
            "model.mlp.d_hidden=64",
            "model.ray.num_rays=16",
        ])
        jsonl = os.path.join(out, "csv", "metrics.jsonl")
        rows = [json.loads(l) for l in open(jsonl)]
        vals = [(i, r["val_combined"]) for i, r in enumerate(rows) if "val_combined" in r]
        assert len(vals) == 4
        best_idx = int(np.argmin([v for _, v in vals]))
        # the retained checkpoint step equals the best-val epoch
        ck = os.path.join(out, "checkpoints")
        kept = sorted(int(d) for d in os.listdir(ck) if d.isdigit())
        assert kept == [best_idx], (kept, vals)

        # inference also selects the monitored-best checkpoint (reference
        # predicts from best_model_path) and records provenance
        import predict as predict_cli

        pred_out = str(tmp_path / "pred_best")
        predict_cli.main([
            f"ckpt_path={ck}",
            f"paths.data_dir={root}",
            f"paths.output_dir={pred_out}",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.dataset_type=scenes",
            "data.num_frames_test=4",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
        ])
        meta = json.load(open(os.path.join(pred_out, "predict_meta.json")))
        assert meta["epoch"] == best_idx
        assert meta["selected_by"] == "val_combined"


@pytest.mark.slow
class TestEikonalTraining:
    def test_train_cli_descends_with_eikonal_loss(self, synth_data, tmp_path):
        """VERDICT round-3 next #5: e2e descent with use_eikonal=true.
        The eikonal term regularizes |grad tsdf| toward 1/trunc away from
        the surface (reference model.py:360-430 loss modes); it must be
        reported as a metric, stay finite, and the combined loss must still
        converge through the real CLI (the vjp decode-with-grad path is in
        the train step, not just the unit suite)."""
        root, _ = synth_data
        import train as train_cli

        out = str(tmp_path / "run_eik")
        train_cli.main([
            "experiment=overfit_synthetic",
            "data=frame",
            f"paths.data_dir={root}",
            f"paths.output_dir={out}",
            "trainer.max_epochs=8",
            "trainer.check_val_every_n_epoch=8",
            "trainer.num_sanity_val_steps=0",
            "data.datasets_train=[scans/scene_synth0/info.json]",
            "data.datasets_val=[scans/scene_synth0/info.json]",
            "data.datasets_test=[scans/scene_synth0/info.json]",
            "data.frame_idx=0",
            "data.length_train=4",
            "data.length_val=1",
            "data.voxel_dim_train=[40,40,20]",
            "data.voxel_dim_val=[40,40,20]",
            "data.voxel_dim_test=[40,40,20]",
            "data.voxel_size=0.08",
            "model.encoder.pointnet.plane_resolution=32",
            "model.encoder.pointnet.num_sparse_points=128",
            "model.mlp.d_hidden=128",
            "model.ray.num_rays=32",
            "model.optimizer.lr=0.001",
            "model.loss.use_eikonal=true",
            "model.loss.eikonal.weight=0.01",
        ])
        jsonl = os.path.join(out, "csv", "metrics.jsonl")
        rows = [json.loads(l) for l in open(jsonl)]
        eik = [r["train_eikonal"] for r in rows if "train_eikonal" in r]
        tsdf = [r["train_tsdf"] for r in rows if "train_tsdf" in r]
        assert len(eik) >= 10, "eikonal term not reported as a train metric"
        # the original bug: jnp.linalg.norm's NaN vjp at the zero-init
        # gradient field poisoned the params on step 0 — every metric after
        # the first was NaN
        assert np.isfinite(eik).all()
        assert np.isfinite(tsdf).all()
        # the regularizer itself optimizes: |grad|-1 descends from the
        # zero-init field's ~1.8-5.5 to a stable sub-1 plateau (measured
        # trajectory in BENCH.md); the data term pays a small tax at
        # weight 0.01 but must not diverge (broken steps saturate to ~1.2)
        assert np.mean(eik[-8:]) < 1.0, eik
        assert np.mean(eik[-8:]) < np.mean(eik[:4]), eik
        assert np.mean(tsdf[-8:]) < 0.5, tsdf
