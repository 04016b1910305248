"""Coverage for harness paths not exercised by the main e2e test:
checkpoint resume, tar-archived datasets, streaming encode merge,
spatial-encoder (BatchNorm) training, fusion label volumes."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennerf_tpu.train.tasks import GenNerfTask


def _tiny_cfg(**over):
    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
        "ray": {"num_rays": 8, "N": 4, "M": 2, "d_min": 0.07, "delta": 0.1, "sigma": 0.1},
    }
    cfg.update(over)
    return cfg


def _batch(rng, B=1, T=2, H=12, W=16):
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
        "intrinsics": np.tile((np.eye(3) * 10).astype(np.float32), (B, T, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    return batch


class TestCheckpointResume:
    def test_save_restore_roundtrip_and_continue(self, rng, tmp_path):
        from gennerf_tpu.train.checkpoints import CheckpointManager

        task = GenNerfTask(_tiny_cfg())
        batch = _batch(rng)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, _ = task.run_train_step(state, batch, jax.random.PRNGKey(1))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state, {"model": {"type": "GenNerf"}})
        assert mgr.latest_epoch() == 0

        template = task.init_state(jax.random.PRNGKey(9), batch)
        restored = mgr.restore(template)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)
        # training continues from the restored state
        restored2, metrics = task.run_train_step(restored, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["combined"]))
        # config snapshot written
        assert json.load(open(tmp_path / "ckpt" / "config.json"))["model"]["type"] == "GenNerf"


class TestArchivedDataset:
    def test_from_archive_roundtrip(self, tmp_path):
        from gennerf_tpu.data.synthetic import generate_scene
        from gennerf_tpu.data.datamodule import ScannetDataModule

        info = generate_scene(str(tmp_path), num_frames=4, H=32, W=40,
                              voxel_sizes=(16,), use_tar=True)
        # remove loose files so only the tars can serve the data
        scene_dir = os.path.dirname(info)
        for sub in ("color", "depth"):
            for fn in os.listdir(os.path.join(scene_dir, sub)):
                if not fn.endswith(".tar"):
                    os.remove(os.path.join(scene_dir, sub, fn))

        cfg = {
            "data_dir": str(tmp_path),
            "datasets_train": ["scans/scene_synth0/info.json"],
            "datasets_val": ["scans/scene_synth0/info.json"],
            "datasets_test": ["scans/scene_synth0/info.json"],
            "dataset_type": "frame", "frame_idx": 0,
            "length_train": 1, "length_val": 1, "length_test": 1,
            "batch_size": 1, "voxel_size": 0.16,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "voxel_types": ["tsdf"], "from_archive": True,
        }
        dm = ScannetDataModule(cfg)
        b = next(iter(dm.train_dataloader()))
        assert b["image"].shape == (1, 1, 3, 480, 640)
        assert (b["depth"] > 0).mean() > 0.2


class TestStreamingEncode:
    def test_merge_matches_reference_semantics(self, rng):
        """encode(all frames) vs merge(encode(first), encode(second)) —
        volumes add, planes weighted-average (reference model.py:121-150)."""
        cfg_dict = _tiny_cfg()
        cfg_dict["encoder"]["plane_merger"] = {"strategy": "average", "alpha": 0.25}
        task = GenNerfTask(cfg_dict)
        model, cfg = task.model, task.cfg
        batch = _batch(rng, B=1, T=4)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        from gennerf_tpu.models.gen_nerf import GenNerf

        key = jax.random.PRNGKey(3)

        def enc(sl):
            r, _ = model.apply(
                variables,
                jnp.asarray(batch["projection"][:, sl]),
                jnp.asarray(batch["image"][:, sl]),
                jnp.asarray(batch["depth"][:, sl]),
                key, (16, 16, 8), jnp.zeros(3), train=False,
                method=GenNerf.encode, mutable=["batch_stats"],
            )
            return r

        r1 = enc(slice(0, 2))
        r2 = enc(slice(2, 4))
        merged = model.apply(variables, r2, r1, method=GenNerf.merge)
        # average merge with alpha: new*alpha + old*(1-alpha)
        expect = 0.25 * np.asarray(r2.planes["xz"]) + 0.75 * np.asarray(r1.planes["xz"])
        np.testing.assert_allclose(np.asarray(merged.planes["xz"]), expect, rtol=1e-5)


class TestSpatialEncoderTraining:
    def test_batch_stats_update_and_step(self, rng):
        cfg = _tiny_cfg()
        cfg["encoder"] = {
            "use_spatial": True,
            "spatial": {"backbone": "resnet18", "num_layers": 2,
                        "feature_scale": 1.0, "blur_image": False},
            "use_pointnet": False,
        }
        task = GenNerfTask(cfg)
        batch = _batch(rng, B=1, T=2, H=16, W=16)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        stats0 = jax.tree.leaves(state.batch_stats)
        assert stats0, "spatial encoder must carry BatchNorm stats"
        state2, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["combined"]))
        # running statistics moved
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(stats0, jax.tree.leaves(state2.batch_stats))
        )
        assert moved

    def _spatial_cfg(self, **spatial_over):
        cfg = _tiny_cfg()
        spatial = {"backbone": "resnet18", "num_layers": 2,
                   "feature_scale": 1.0, "blur_image": False}
        spatial.update(spatial_over)
        cfg["encoder"] = {"use_spatial": True, "spatial": spatial,
                          "use_pointnet": False}
        return cfg

    def test_frame_chunk_encode_matches_one_pass(self, rng):
        """spatial.frame_chunk (the scan-over-T memory lever for reference
        resolution, SpatialEncoderConfig.frame_chunk) must be numerically
        equivalent to the one-pass folded encode: same params, eval mode
        (fixed BN stats), chunk=1 vs chunk=0 -> same losses."""
        batch = _batch(rng, B=1, T=4, H=16, W=16)
        task0 = GenNerfTask(self._spatial_cfg())
        task1 = GenNerfTask(self._spatial_cfg(frame_chunk=1))
        task3 = GenNerfTask(self._spatial_cfg(frame_chunk=3))  # ragged tail
        state = task0.init_state(jax.random.PRNGKey(0), batch)
        m0 = task0.run_eval_step(state, batch, jax.random.PRNGKey(1))
        m1 = task1.run_eval_step(state, batch, jax.random.PRNGKey(1))
        m3 = task3.run_eval_step(state, batch, jax.random.PRNGKey(1))
        for m in (m1, m3):
            np.testing.assert_allclose(
                float(m["combined"]), float(m0["combined"]), rtol=1e-5
            )
        # and the chunked TRAIN step runs (remat composes with the loop)
        cfg_r = self._spatial_cfg(frame_chunk=1)
        cfg_r["remat"] = True
        task_r = GenNerfTask(cfg_r)
        state_r = task_r.init_state(jax.random.PRNGKey(0), batch)
        _, metrics = task_r.run_train_step(state_r, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["combined"]))

    def test_out_channels_reduces_latent(self, rng):
        """spatial.out_channels (the reference's 1x1 channel-reduce,
        spatial_encoder.py:74-77) shrinks the decoder d_in and the
        backprojected volume channels; the step still trains."""
        from gennerf_tpu.models.config import GenNerfConfig, config_from_dict

        cfg_d = self._spatial_cfg(out_channels=8)
        cfg = config_from_dict(GenNerfConfig, cfg_d)
        assert cfg.encoder_latent == 8
        task = GenNerfTask(cfg_d)
        batch = _batch(rng, B=1, T=2, H=16, W=16)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        _, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["combined"]))


class TestFusionLabels:
    def test_label_volume_accumulates(self, rng):
        from gennerf_tpu.tsdf import TSDFFusion

        fus = TSDFFusion((8, 8, 8), 0.1, (-0.4, -0.4, -0.4), color=True, label=True)
        K = np.array([[10.0, 0, 8], [0, 10.0, 6], [0, 0, 1]], np.float32)
        proj = (K @ np.eye(4)[:3]).astype(np.float32)
        proj[2, 2] = 1.0
        depth = np.full((12, 16), 0.35, np.float32)
        color = rng.random((3, 12, 16)).astype(np.float32) * 255
        label = np.full((12, 16), 7, np.int32)
        fus.integrate(jnp.asarray(proj), jnp.asarray(depth), jnp.asarray(color), jnp.asarray(label))
        tsdf = fus.get_tsdf(label_name="semseg")
        assert "color" in tsdf.attribute_vols and "semseg" in tsdf.attribute_vols
        sem = np.asarray(tsdf.attribute_vols["semseg"])
        assert (sem == 7).any() and (sem == -1).any()


class TestHybridMeshTrainer:
    def test_trainer_num_slices_builds_hybrid_mesh(self, tmp_path):
        """trainer.num_slices (configs/trainer/tpu_pod.yaml) selects the
        (slice, data) hybrid mesh; batches shard over both axes."""
        from gennerf_tpu.train.loop import Trainer

        tr = Trainer(devices=8, num_slices=2, output_dir=str(tmp_path))
        assert tr.mesh.shape == {"slice": 2, "data": 4}
        tr1 = Trainer(devices=8, output_dir=str(tmp_path))
        assert tr1.mesh.shape == {"data": 8}

    def test_num_slices_must_divide_devices(self, tmp_path):
        from gennerf_tpu.train.loop import Trainer

        with pytest.raises(ValueError):
            Trainer(devices=8, num_slices=3, output_dir=str(tmp_path))


class TestItemCache:
    def test_cached_items_identical_and_faster_io(self, tmp_path):
        """data.cache_items: cached reload returns byte-identical frames
        and volumes, and skips the tar/npz IO."""
        from gennerf_tpu.data.datasets import (
            FrameDataset,
            configure_item_cache,
            _frame_cache,
        )
        from gennerf_tpu.data.synthetic import generate_scene

        root = str(tmp_path / "d")
        info = generate_scene(root, num_frames=3, H=24, W=32, voxel_sizes=(8,),
                              use_tar=True)
        try:
            ds = FrameDataset([info], frame_idx=1, length=4,
                              frame_types=["depth"],
                              voxel_types=["tsdf"], voxel_sizes=[8])
            configure_item_cache(frames=0, volumes=0)
            cold = ds[0]
            configure_item_cache(frames=64, volumes=8)
            warm0 = ds[0]   # miss -> populate
            assert len(_frame_cache._d) > 0
            warm1 = ds[0]   # hit
            for key in ("image", "depth"):
                np.testing.assert_array_equal(
                    np.array(cold["frames"][0][key]),
                    np.array(warm1["frames"][0][key]),
                )
            np.testing.assert_array_equal(
                np.asarray(cold["vol_08"].tsdf_vol),
                np.asarray(warm1["vol_08"].tsdf_vol),
            )
            # hits don't alias: mutating one item's arrays must not leak
            a = np.array(warm1["frames"][0]["image"])
            a[:] = 0
            again = ds[0]
            assert np.array(again["frames"][0]["image"]).any()
        finally:
            configure_item_cache(0, 0)


class TestGradientClip:
    def test_clip_chained_before_adam(self):
        """trainer.gradient_clip_val must actually clip (the knob was
        previously accepted and dead). Adam is scale-invariant on a single
        step, so probe via the second-moment history: a huge step-1
        gradient poisons the unclipped Adam's nu and crushes a normal
        step-2 update, while the clipped chain never sees the spike."""
        import optax

        from gennerf_tpu.models.config import OptimizerConfig
        from gennerf_tpu.train.state import make_optimizer

        params = {"w": jnp.zeros(3, jnp.float32)}
        g_spike = {"w": jnp.asarray([1e4, 0.0, 0.0], jnp.float32)}
        g_normal = {"w": jnp.asarray([1.0, 0.0, 0.0], jnp.float32)}

        def two_steps(tx):
            st = tx.init(params)
            _, st = tx.update(g_spike, st, params)
            u2, _ = tx.update(g_normal, st, params)
            return float(jnp.abs(u2["w"][0]))

        free = two_steps(make_optimizer(OptimizerConfig(lr=0.1)))
        clipped = two_steps(make_optimizer(OptimizerConfig(lr=0.1),
                                           gradient_clip_val=1.0))
        # clipped: both steps see unit-norm gradients -> step-2 update is
        # the full Adam step (~lr, measured 0.0999); unclipped: the spike
        # poisons m AND nu, damping step 2 (measured 0.067)
        assert abs(clipped - 0.1) < 0.005, clipped
        assert free < 0.8 * clipped, (clipped, free)

    def test_task_threads_clip(self, rng):
        """make_task(gradient_clip_val=...) reaches the optimizer chain and
        the task records it (the Trainer warns on mismatch)."""
        from gennerf_tpu.train.tasks import make_task

        cfg = {
            "type": "GenNerf", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "encoder": {"use_spatial": False, "use_pointnet": True,
                        "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                     "hidden_dim": 8, "plane_resolution": 16,
                                     "n_blocks": 2, "unet": False}},
            "mlp": {"d_out_sem": 8, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 16},
            "ray": {"num_rays": 8, "N": 2, "M": 1, "d_min": 0.07,
                    "delta": 0.1, "sigma": 0.1},
        }
        task = make_task(cfg, gradient_clip_val=0.5)
        assert task.gradient_clip_val == 0.5
        batch = {
            "projection": rng.standard_normal((1, 2, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((1, 2, 3, 16, 20)).astype(np.float32),
            "depth": (rng.random((1, 2, 16, 20)) + 0.5).astype(np.float32),
            "pose": np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1)),
            "intrinsics": np.tile((np.eye(3) * 20).astype(np.float32), (1, 2, 1, 1)),
            "vol_08_tsdf": rng.uniform(-1, 1, (1, 1, 16, 16, 8)).astype(np.float32),
        }
        batch["projection"][:, :, 2, 2] = 1.0
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["combined"]))


class TestBatchLimits:
    """trainer.limit_{train,val,test}_batches (Lightning semantics) — these
    keys previously fell into Trainer's **kwargs catch-all and were
    SILENTLY ignored (the round-2 dead-trainer.precision failure class)."""

    def _trainer(self, tmp_path, **kw):
        from gennerf_tpu.train.loop import Trainer

        return Trainer(devices=8, output_dir=str(tmp_path), **kw)

    def test_batch_limit_semantics(self, tmp_path):
        tr = self._trainer(tmp_path)

        class Sized(list):
            pass

        loader = Sized(range(10))
        assert tr._batch_limit(None, loader) is None
        assert tr._batch_limit(3, loader) == 3
        assert tr._batch_limit(1, loader) == 1          # int 1 = ONE batch
        assert tr._batch_limit(1.0, loader) is None     # float 1.0 = all
        assert tr._batch_limit(0.25, loader) == 3       # ceil(0.25 * 10)
        with pytest.raises(ValueError):
            tr._batch_limit(1.5, loader)

    def test_fractional_limit_without_len_runs_all(self, tmp_path):
        tr = self._trainer(tmp_path)
        assert tr._batch_limit(0.5, iter(range(5))) is None

    def test_unknown_trainer_option_warns(self, tmp_path):
        # get_logger's stdout handler is cached across tests (propagate
        # off), so capture with a temporary handler on the same logger
        import io
        import logging

        buf = io.StringIO()
        lg = logging.getLogger("gennerf_tpu")
        h = logging.StreamHandler(buf)
        lg.addHandler(h)
        try:
            self._trainer(tmp_path, limit_train_batchez=3)  # typo'd key
        finally:
            lg.removeHandler(h)
        out = buf.getvalue()
        assert "unknown trainer option" in out and "limit_train_batchez" in out

    def test_limits_bound_fit_and_validate(self, tmp_path):
        """End-to-end through the real fit loop: 5-batch loaders with
        limit_train_batches=2 / limit_val_batches=1 run exactly 2 train
        steps per epoch and 1 val batch."""
        import jax
        import jax.numpy as jnp
        import optax

        from gennerf_tpu.train.state import TrainState

        calls = {"train": 0, "eval": 0}

        class TinyTask:
            name = "tiny"

            class cfg:
                class optimizer:
                    type = "Adam"; lr = 1e-3; weight_decay = 0.0
                class scheduler:
                    type = "StepLR"; step_size = 10; gamma = 0.1

            def init_state(self, key, batch):
                from gennerf_tpu.train.state import make_optimizer

                params = {"w": jnp.zeros((2,))}
                tx = make_optimizer(self.cfg.optimizer)
                return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                  batch_stats={}, opt_state=tx.init(params))

            def run_train_step(self, state, batch, key):
                calls["train"] += 1
                return state.replace(step=state.step + 1), {"combined": jnp.zeros(())}

            def run_eval_step(self, state, batch, key):
                calls["eval"] += 1
                return {"combined": jnp.zeros(())}

        class Loader(list):
            pass

        batches = Loader({"x": np.zeros((8, 1), np.float32)} for _ in range(5))

        class DM:
            def train_dataloader(self):
                return batches

            def val_dataloader(self):
                return batches

        tr = self._trainer(tmp_path, max_epochs=1, limit_train_batches=2,
                           limit_val_batches=1, num_sanity_val_steps=0,
                           prefetch_batches=0, log_every_n_steps=1)
        tr.fit(TinyTask(), DM())
        assert calls["train"] == 2
        assert calls["eval"] == 1
