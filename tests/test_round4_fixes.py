"""Regressions for the round-4 drive-harvest fixes.

The round-3 queued TPU drives trained fine but the predict/eval halves
fell over on two path bugs that only the drive orchestration's exact
argument combination exercised:

1. scripts/predict.py with ``data.voxel_types=[]`` (the GT-less predict
   protocol) crashed with ``KeyError: 'vol_04'`` whenever the info.json
   DID carry GT volumes — ScenesDataset gated the origin-shift branch on
   the info file instead of on what map_tsdf actually loaded
   (reference data.py:354-387 reads its own loaded dict).
2. The eval CLIs invoked as ``--dataset /abs/val.txt --data-dir /abs``
   resolved the split to ``/abs/abs/val.txt`` — parse_splits_list joined
   even absolute, existing paths against data_dir.
"""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_with_gt(tmp_path_factory):
    from gennerf_tpu.data.synthetic import generate_scene

    root = tmp_path_factory.mktemp("r4_scene")
    info = generate_scene(str(root), scene="scene0", num_frames=6, H=48, W=64,
                          voxel_sizes=(16,))
    return str(root), info


class TestParseSplitsListAbsolute:
    def test_absolute_existing_split_used_verbatim(self, tmp_path):
        """The drive scripts pass --dataset $data/val.txt --data-dir $data;
        the split path must not be re-joined into $data/$data/val.txt."""
        from gennerf_tpu.data.datasets import parse_splits_list

        split = tmp_path / "val.txt"
        split.write_text("scans/a/info.json\n")
        out = parse_splits_list([str(split)], data_dir=str(tmp_path))
        assert out == [str(tmp_path / "scans/a/info.json")]

    def test_leading_slash_nonexistent_still_data_dir_relative(self, tmp_path):
        """Reference-style '/splits/val.txt' entries (data_dir-relative with
        a leading slash) keep resolving against data_dir."""
        from gennerf_tpu.data.datasets import parse_splits_list

        (tmp_path / "splits").mkdir()
        (tmp_path / "splits" / "val.txt").write_text("scans/b/info.json\n")
        out = parse_splits_list(["/splits/val.txt"], data_dir=str(tmp_path))
        assert out == [str(tmp_path / "scans/b/info.json")]


class TestGTLessPredictWithGTOnDisk:
    def test_scenes_dataset_empty_voxel_types(self, scene_with_gt):
        """voxel_types=[] (GT-less predict) must take the offset fallback
        even when info.json carries file_name_vol_* entries."""
        root, info = scene_with_gt
        from gennerf_tpu.data.datasets import ScenesDataset

        ds = ScenesDataset(
            [info], num_frames=2, frame_locations="evenly_spaced",
            frame_order="sorted", frame_types=["depth"], voxel_types=[],
            voxel_sizes=[16], voxel_dim=[24, 24, 16], from_archive=False,
            rng=np.random.default_rng(0),
        )
        item = ds[0]  # KeyError: 'vol_16' before the fix
        assert "offset" in item
        np.testing.assert_allclose(
            np.asarray(item["offset"]).reshape(3), [0.0, 0.0, -0.5])

    def test_scenes_dataset_with_gt_keeps_origin_shift(self, scene_with_gt):
        """The GT-derived origin shift (reference data.py:354-367) is
        unchanged when the volume IS requested."""
        root, info = scene_with_gt
        from gennerf_tpu.data.datasets import ScenesDataset

        ds = ScenesDataset(
            [info], num_frames=2, frame_locations="evenly_spaced",
            frame_order="sorted", frame_types=["depth"], voxel_types=["tsdf"],
            voxel_sizes=[16], voxel_dim=[24, 24, 16], from_archive=False,
            rng=np.random.default_rng(0),
        )
        item = ds[0]
        assert "vol_16_tsdf" in item  # FlattenTSDF renames vol_16
        # offset came from the GT origin, not the [0,0,-0.5] fallback
        assert not np.allclose(
            np.asarray(item["offset"]).reshape(3), [0.0, 0.0, -0.5])


class TestPredictModelCfgResolution:
    """ADVICE round-3 items on scripts/predict.py's snapshot handling."""

    def _cfg(self):
        return {
            "model": {"name": "cli_model", "voxel_size": 0.08},
            "data": {"voxel_size": 0.02},
        }

    def _snap(self):
        return {"model": {"name": "snap_model", "voxel_size": 0.04,
                          "decoder": {"d_hidden": 128}}}

    def test_snapshot_wins_without_overrides(self):
        from scripts.predict import resolve_model_cfg

        model_cfg, src = resolve_model_cfg(self._cfg(), self._snap())
        assert model_cfg["name"] == "snap_model"
        assert src == "checkpoint snapshot"

    def test_dotted_override_resolves_interpolation(self):
        """model.voxel_size=${data.voxel_size} must land as the resolved
        float, not the literal '${data.voxel_size}' string."""
        from scripts.predict import resolve_model_cfg

        model_cfg, src = resolve_model_cfg(
            self._cfg(), self._snap(),
            cli_model_overrides=[("voxel_size", "${data.voxel_size}")])
        assert model_cfg["voxel_size"] == 0.02
        assert "voxel_size" in src

    def test_interpolation_sees_snapshot_model_values(self):
        """model-internal references resolve against the SNAPSHOT model."""
        from scripts.predict import resolve_model_cfg

        model_cfg, _ = resolve_model_cfg(
            self._cfg(), self._snap(),
            cli_model_overrides=[("tag", "h${model.decoder.d_hidden}")])
        assert model_cfg["tag"] == "h128"

    def test_group_reselection_wins_over_snapshot(self):
        """A bare model=<name> token must not be silently superseded."""
        from scripts.predict import resolve_model_cfg

        model_cfg, src = resolve_model_cfg(
            self._cfg(), self._snap(), cli_model_group="cli_model")
        assert model_cfg["name"] == "cli_model"
        assert "reselection" in src

    def test_no_snapshot_uses_cli(self):
        from scripts.predict import resolve_model_cfg

        model_cfg, src = resolve_model_cfg(self._cfg(), None)
        assert model_cfg["name"] == "cli_model"
        assert src == "CLI (no snapshot)"


class TestVoxelNetPartialTargets:
    def test_single_scale_target_skips_missing_scales(self):
        """The predict CLI data layer loads GT at ONE voxel size (for grid
        placement); VoxelNet's multi-scale head must compute loss terms only
        for the scales present instead of KeyError'ing on the missing
        coarse-scale targets (reference heads3d.py:84-176 iterates
        self.voxel_sizes unconditionally but is only ever fed full target
        pyramids by Lightning; our task surface also serves predict)."""
        import jax
        import jax.numpy as jnp

        from gennerf_tpu.models.heads import TSDFHead

        head = TSDFHead(channels=(8, 16, 32), voxel_size=0.04)
        xs = [jnp.zeros((1, 8, 4, 4, 2)), jnp.zeros((1, 8, 8, 8, 4))]
        full = {
            "vol_08_tsdf": jnp.ones((1, 1, 4, 4, 2)),
            "vol_04_tsdf": jnp.ones((1, 1, 8, 8, 4)),
        }
        partial = {"vol_04_tsdf": jnp.ones((1, 1, 8, 8, 4))}
        variables = head.init(jax.random.PRNGKey(0), xs, full)
        out_full, losses_full = head.apply(variables, xs, full)
        out_part, losses_part = head.apply(variables, xs, partial)
        assert set(losses_full) == {"vol_08_tsdf_loss", "vol_04_tsdf_loss"}
        assert set(losses_part) == {"vol_04_tsdf_loss"}
        # outputs unaffected by which targets exist
        for k in out_full:
            np.testing.assert_array_equal(out_full[k], out_part[k])


class TestHeadSmoothing:
    """model.mlp.head_smoothing (VERDICT round-3 next #6): the point head's
    tanh output scale. At s > 1 a +-1 target needs tanh = +-1/s, so the
    field never freezes at exactly +-1 (which TSDF.get_mesh treats as
    unknown/outside -> EMPTY meshes from half-budget checkpoints)."""

    def _mini_cfg(self, smoothing):
        return {
            "type": "GenNerf", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "encoder": {"use_spatial": False, "use_pointnet": True,
                        "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                     "hidden_dim": 8, "plane_resolution": 16,
                                     "n_blocks": 2, "unet": False}},
            "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2,
                    "d_hidden": 32, "head_smoothing": smoothing},
        }

    def test_simple_head_scales_tanh(self):
        import jax
        import jax.numpy as jnp

        from gennerf_tpu.models.heads import TSDFHeadSimple

        x = jnp.linspace(-3, 3, 12).reshape(4, 3)
        plain = TSDFHeadSimple()
        smooth = TSDFHeadSimple(smoothing=1.05)
        v = plain.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(smooth.apply(v, x)),
            1.05 * np.asarray(plain.apply(v, x)), rtol=1e-6)
        # range now exceeds 1: saturation can't pin the field at +-1
        assert float(jnp.abs(smooth.apply(v, x * 100)).max()) > 1.0

    def test_all_decode_tiers_apply_smoothing(self, rng=None):
        """The gather decode, the separable XLA grid tier, and the fused
        point kernel (interpret mode) must all scale by head_smoothing —
        a tier that forgot the factor would silently fork inference
        numerics from training."""
        import jax
        import jax.numpy as jnp

        from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr
        from gennerf_tpu.train.predict import (
            decode_dense,
            decode_grid_separable_xla,
            dense_grid_points,
            make_point_tsdf_fn,
        )
        from gennerf_tpu.train.tasks import GenNerfTask

        rng = np.random.default_rng(0)
        B, T, H, W = 1, 2, 12, 16
        batch = {
            "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
            "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
            "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
        }
        batch["projection"][:, :, 2, 2] = 1.0

        vols = {}
        for s in (1.0, 1.05):
            task = GenNerfTask(self._mini_cfg(s))
            state = task.init_state(jax.random.PRNGKey(0), batch)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            repr_, _ = task.model.apply(
                variables, jnp.asarray(batch["projection"]),
                jnp.asarray(batch["image"]), jnp.asarray(batch["depth"]),
                jax.random.PRNGKey(0), (16, 16, 8), jnp.zeros(3),
                train=False, method=GenNerf.encode, mutable=["batch_stats"])
            repr_ = SceneRepr(volume=None, valid=repr_.valid,
                              planes={k: 0.02 * v for k, v in repr_.planes.items()})
            origin = jnp.zeros(3, jnp.float32)
            pts = dense_grid_points((16, 16, 8), 0.08, np.zeros(3))
            gather = decode_dense(task.model, variables, repr_, pts, origin)
            sep = decode_grid_separable_xla(
                task.model, variables, repr_, (16, 16, 8), 0.08, origin)
            fn = make_point_tsdf_fn(task.model, variables, repr_, origin,
                                    tile=256, interpret=True)
            fused = fn(pts.reshape(1, -1, 3))[0]
            vols[s] = (np.asarray(gather), np.asarray(sep).ravel(),
                       np.asarray(fused))
        for a, b in zip(vols[1.05], vols[1.0]):
            np.testing.assert_allclose(a, 1.05 * b, atol=5e-4)


class TestZeroWindowWarning:
    def test_loader_warns_on_floored_zero_windows(self, scene_with_gt):
        """sequence_amount x (frames/window) flooring to 0 now warns instead
        of silently dropping the scene's data (ADVICE round-3 #4)."""
        root, info = scene_with_gt
        from gennerf_tpu.data.datasets import ScenesSequencesDataset

        with pytest.warns(UserWarning, match="ZERO windows"):
            ds = ScenesSequencesDataset(
                [info], sequence_amount=0.8, sequence_length=6,
                sequence_locations="free", sequence_order="random",
                num_frames=2, frame_locations="evenly_spaced",
                frame_order="sorted", frame_types=["depth"], voxel_types=[],
                voxel_sizes=[16], from_archive=False,
                rng=np.random.default_rng(0),
            )
        assert len(ds) == 0


class TestEvalGtMeshFallback:
    def test_missing_gt_mesh_file_meshes_fused_tsdf(self, scene_with_gt, tmp_path):
        """Real ScanNet ships scene*_vh_clean_2.ply; scenes prepared from
        bare .sens containers record the expected mesh path in info.json
        without the file existing. The eval CLI must fall back to meshing
        the fused GT TSDF instead of FileNotFoundError (found by the
        full-lifecycle dry-run, job_scripts/full_lifecycle.sh)."""
        import json
        import shutil

        from gennerf_tpu.eval.evaluation import process
        from gennerf_tpu.tsdf import TSDF

        root, info_file = scene_with_gt
        info = json.loads(open(info_file).read())
        # copy the scene dir so we can doctor info.json without breaking
        # the shared module-scoped fixture
        src_dir = os.path.dirname(info_file)
        work = tmp_path / "scene"
        shutil.copytree(src_dir, work)
        info_path = work / "info.json"
        doctored = json.loads(info_path.read_text())
        # retarget every path into the copy
        for k, v in list(doctored.items()):
            if isinstance(v, str) and v.startswith(src_dir):
                doctored[k] = str(work / os.path.relpath(v, src_dir))
        if "frames" in doctored:
            for fr in doctored["frames"]:
                for k, v in list(fr.items()):
                    if isinstance(v, str) and v.startswith(src_dir):
                        fr[k] = str(work / os.path.relpath(v, src_dir))
        doctored["file_name_mesh_gt"] = str(work / "does_not_exist.ply")
        info_path.write_text(json.dumps(doctored))

        # a "prediction" = the GT volume itself -> metrics must be strong
        results = tmp_path / "results"
        results.mkdir()
        scene = doctored["scene"]
        gt = TSDF.load(str(work / os.path.basename(info["file_name_vol_16"])))
        gt.save(str(results / f"{scene}.npz"))
        gt.get_mesh().export(str(results / f"{scene}.ply"))

        m = process(str(info_path), str(results), num_frames=2)
        # no FileNotFoundError; the GT-vs-GT TSDF compare is exact (mesh
        # P/R/F are resolution-limited at this 16 cm fixture and 2-frame
        # re-fusion trim, so only their presence is asserted)
        assert m["l1"] < 1e-6
        assert {"prec", "recal", "fscore"} <= set(m)


class TestDecodeTierCompileFallback:
    def test_mosaic_compile_failure_falls_through_with_warning(self, monkeypatch):
        """A statically-legal tile can still be REJECTED by Mosaic at
        compile time (observed at the reference-default [416,416,128]
        grid: pick_grid_tile returns tj=32, the remote compile 500s).
        The dispatcher must treat the jax runtime error like
        NotImplementedError — warn + fall to the XLA tier — instead of
        crashing the predict CLI."""
        import jax
        import jax.numpy as jnp

        from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr
        from gennerf_tpu.train import predict as P
        from gennerf_tpu.train.tasks import GenNerfTask

        rng = np.random.default_rng(0)
        cfg = {
            "type": "GenNerf", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "encoder": {"use_spatial": False, "use_pointnet": True,
                        "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                     "hidden_dim": 8, "plane_resolution": 16,
                                     "n_blocks": 2, "unet": False}},
            "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2,
                    "d_hidden": 32},
        }
        task = GenNerfTask(cfg)
        B, T, H, W = 1, 2, 12, 16
        batch = {
            "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
            "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
            "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
        }
        batch["projection"][:, :, 2, 2] = 1.0
        state = task.init_state(jax.random.PRNGKey(0), batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        repr_, _ = task.model.apply(
            variables, jnp.asarray(batch["projection"]),
            jnp.asarray(batch["image"]), jnp.asarray(batch["depth"]),
            jax.random.PRNGKey(0), (16, 16, 8), jnp.zeros(3), train=False,
            method=GenNerf.encode, mutable=["batch_stats"])
        origin = np.asarray([0.05, -0.1, 0.02], np.float32)
        voxel_dim = (16, 16, 8)

        expected = P.decode_grid_separable_xla(
            task.model, variables, repr_, voxel_dim, 0.08,
            jnp.asarray(origin))

        err_cls = P._jax_runtime_error_types()[0]

        def exploding_fused(*a, **k):
            raise err_cls("INTERNAL: tpu_compile_helper subprocess exit code 1")

        monkeypatch.setattr(P, "decode_grid_fused", exploding_fused)
        with pytest.warns(UserWarning, match="falling back to the next"):
            vol = P.predict_tsdf_volume(
                task.model, variables, repr_, voxel_dim, 0.08, origin)
        np.testing.assert_allclose(np.asarray(vol), np.asarray(expected),
                                   atol=1e-6)
