"""Semantic distillation path + surface renderer tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennerf_tpu.models.teacher import (
    RandomProjectionTeacher,
    make_teacher,
    sample_teacher_features,
)
from gennerf_tpu.models.renderer import SurfaceRenderer, pixels_to_rays, ray_march_tsdf


class TestTeacher:
    def test_shapes_and_determinism(self, rng):
        t = RandomProjectionTeacher(feature_dim=16, patch=8, stride=4, seed=3)
        x = jnp.asarray(rng.standard_normal((2, 3, 32, 48)).astype(np.float32))
        f1 = t(x)
        f2 = RandomProjectionTeacher(feature_dim=16, patch=8, stride=4, seed=3)(x)
        assert f1.shape == (2, 16, 8, 12)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_sampling_pixel_alignment(self, rng):
        t = RandomProjectionTeacher(feature_dim=8, patch=4, stride=2, seed=0)
        x = jnp.asarray(rng.standard_normal((1, 3, 16, 24)).astype(np.float32))
        fmap = t(x)
        h = jnp.asarray([[0, 8, 15]])
        w = jnp.asarray([[0, 12, 23]])
        out = sample_teacher_features(fmap, h, w, (16, 24))
        assert out.shape == (1, 3, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_factory(self):
        assert make_teacher({"type": "none"}) is None
        t = make_teacher({"type": "random_projection", "feature_dim": 32})
        assert t.feature_dim == 32


class TestDistillTraining:
    def test_distill_loss_decreases_sem_feature_alignment(self, rng, tmp_path):
        """Smoke: the distill-enabled train step runs and produces a finite
        extra loss term."""
        from gennerf_tpu.train.tasks import GenNerfTask

        cfg = {
            "type": "GenNerf", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "encoder": {"use_spatial": False, "use_pointnet": True,
                        "pointnet": {"num_sparse_points": 64, "c_dim": 16,
                                     "hidden_dim": 16, "plane_resolution": 16,
                                     "n_blocks": 2, "unet": False}},
            "mlp": {"d_out_sem": 16, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
            "ray": {"num_rays": 16, "N": 4, "M": 2, "d_min": 0.07, "delta": 0.1, "sigma": 0.1},
            "teacher": {"type": "random_projection", "feature_dim": 16, "patch": 4, "stride": 4},
            "loss": {"use_tsdf": True, "use_distill": True,
                     "distill": {"weight": 1.0, "metric": "cosine"}},
        }
        task = GenNerfTask(cfg)
        B, T, H, W = 1, 2, 16, 20
        batch = {
            "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
            "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
            "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
            "intrinsics": np.tile((np.eye(3) * 20).astype(np.float32), (B, T, 1, 1)),
            "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
        }
        batch["projection"][:, :, 2, 2] = 1.0
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
        assert "distill" in metrics
        assert np.isfinite(float(metrics["distill"]))
        # metrics are per-frame sums over T=2 -> range [0, 2*T]
        assert 0.0 <= float(metrics["distill"]) <= 4.0
        # a few steps reduce the distillation term on the same batch
        d0 = float(metrics["distill"])
        for i in range(10):
            state, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(2 + i))
        assert float(metrics["distill"]) < d0


class TestRenderDistillTraining:
    def _cfg(self, sampling_mode="ray"):
        return {
            "type": "GenNerf", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "sampling_mode": sampling_mode,
            "encoder": {"use_spatial": False, "use_pointnet": True,
                        "pointnet": {"num_sparse_points": 64, "c_dim": 16,
                                     "hidden_dim": 16, "plane_resolution": 16,
                                     "n_blocks": 2, "unet": False,
                                     "normalize_coords": True}},
            "mlp": {"d_out_sem": 16, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
            "ray": {"num_rays": 16, "N": 4, "M": 2, "d_min": 0.07, "delta": 0.1, "sigma": 0.1},
            "frustum": {"N_free": 8, "N_near": 4, "N_surf": 4, "d_min": 0.1,
                        "d_max": 2.0, "sigma": 0.05},
            "teacher": {"type": "random_projection", "feature_dim": 16, "patch": 4, "stride": 4},
            "loss": {"use_tsdf": True, "use_distill": True,
                     "distill": {"weight": 1.0, "metric": "cosine",
                                 "mode": "render", "render_rays": 16,
                                 "render_steps": 16, "render_fine": 4,
                                 "render_secant": 2, "render_far": 3.0}},
        }

    def _batch(self, rng, B=1, T=2, H=16, W=20):
        # fusion-convention sphere GT (positive inside, negative free
        # space), placed INSIDE the camera cone of the identity pose so
        # marched rays cross it: center rays (fx=20, pixels up to 16x20)
        # cover xy in [0, ~0.4] at z=0.4
        nx, ny, nz, vs = 16, 16, 8, 0.08
        xs, ys, zs = np.meshgrid(
            np.arange(nx) * vs, np.arange(ny) * vs, np.arange(nz) * vs, indexing="ij"
        )
        c, r = np.array([0.2, 0.15, 0.4]), 0.2
        d = np.sqrt((xs - c[0]) ** 2 + (ys - c[1]) ** 2 + (zs - c[2]) ** 2)
        vol = np.clip((r - d) / (3 * vs), -1, 1).astype(np.float32)[None, None]
        batch = {
            "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
            "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
            "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
            "intrinsics": np.tile((np.eye(3) * 20).astype(np.float32), (B, T, 1, 1)),
            "vol_08_tsdf": np.tile(vol, (B, 1, 1, 1, 1)),
        }
        batch["projection"][:, :, 2, 2] = 1.0
        return batch

    def test_gt_warmstart_keeps_signal_alive_on_crossing_free_field(self, rng):
        """Round-4 regression: a saturated (crossing-free) field emptied the
        `ok & hit` teacher mask and the distill term logged exactly 0.0 for
        59/60 epochs — training on nothing. With gt_warmstart (default),
        no-hit rays fall back to their GT-depth surface points, so the term
        has support and a positive value whenever depth is valid; the new
        distill_coverage / render_hit_rate scalars expose the mask state
        in-band."""
        from gennerf_tpu.train.tasks import GenNerfTask

        # march window far behind the 1.28x1.28x0.64 m volume box: the
        # AABB-clipped intervals are empty, so NO ray ever hits — the
        # deterministic analog of the saturated-field regime
        cfg = self._cfg()
        cfg["loss"]["distill"]["render_near"] = 4.0
        cfg["loss"]["distill"]["render_far"] = 4.5
        batch = self._batch(rng)

        task = GenNerfTask(cfg)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        _, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(10))
        assert float(metrics["render_hit_rate"]) == 0.0
        assert float(metrics["distill_coverage"]) > 0.0  # GT-depth fallback
        assert float(metrics["distill"]) > 0.0  # live signal from epoch 0

        # without the warm start the term dies silently (the round-4 bug),
        # and the coverage scalar is what makes that visible
        cfg_off = self._cfg()
        cfg_off["loss"]["distill"]["render_near"] = 4.0
        cfg_off["loss"]["distill"]["render_far"] = 4.5
        cfg_off["loss"]["distill"]["gt_warmstart"] = False
        task_off = GenNerfTask(cfg_off)
        state_off = task_off.init_state(jax.random.PRNGKey(0), batch)
        _, m_off = task_off.run_train_step(state_off, batch, jax.random.PRNGKey(10))
        assert float(m_off["distill_coverage"]) == 0.0
        assert float(m_off["distill"]) == 0.0

    def test_render_distill_engages(self, rng):
        """mode='render': rays marched through the live decoded field inside
        the train step; hit rays produce a strictly positive masked cosine
        term (the reference's intended UNISURF distillation path,
        renderer.py:39-213)."""
        from gennerf_tpu.train.tasks import GenNerfTask

        task = GenNerfTask(self._cfg())
        batch = self._batch(rng)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(10))
        assert "distill" in metrics
        d0 = float(metrics["distill"])
        assert np.isfinite(d0)
        # the init field (normalize_coords) crosses zero along cone rays:
        # some rays hit, so the masked cosine term engages
        assert d0 > 0.0
        # per-frame sums over T=2 of a loss in [0, 2] -> bounded by 2*T
        assert d0 <= 4.0

    def test_rendered_feature_alignment_at_fixed_geometry(self, rng):
        """The distillation objective is descended by its autograd gradient
        at FROZEN marched points (the stop-gradient contract: geometry is
        held, e_sem aligns toward the teacher at the rendered pixels). The
        live-march loop re-renders every step, so the end-to-end trajectory
        is not a descent curve by construction (UNISURF semantics); this
        pins the alignment mechanics."""
        import optax

        from gennerf_tpu.models.gen_nerf import GenNerf
        from gennerf_tpu.models.renderer import pixels_to_rays, ray_march_tsdf
        from gennerf_tpu.models.teacher import sample_teacher_features
        from gennerf_tpu.train import step as step_mod
        from gennerf_tpu.train.tasks import GenNerfTask

        task = GenNerfTask(self._cfg())
        batch = {k: jnp.asarray(v) for k, v in self._batch(rng).items()}
        state = task.init_state(jax.random.PRNGKey(0), batch)
        model, cfg = task.model, task.cfg
        B, T = batch["image"].shape[:2]
        BT = B * T
        H, W = batch["image"].shape[-2:]
        origin = jnp.zeros(3, jnp.float32)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # derive the SAME keys the train step uses for PRNGKey(10) (which
        # test_render_distill_engages proves yields hit rays at init)
        k_enc, k_sample = jax.random.split(jax.random.PRNGKey(10))
        repr_, _ = model.apply(
            variables, batch["projection"], batch["image"], batch["depth"],
            k_enc, tuple(cfg.voxel_dim_train), origin,
            train=False, method=GenNerf.encode, mutable=["batch_stats"],
        )
        # march ONCE at init params -> frozen surface points + targets
        from gennerf_tpu import ops

        dcfg = cfg.loss.distill
        depth_bt = batch["depth"].reshape(BT, H, W)
        _, h_r, w_r, ok_r = ops.sample_valid_depth_pixels(
            jax.random.fold_in(k_sample, 7), depth_bt, dcfg.render_rays
        )
        origins, dirs = pixels_to_rays(
            h_r.astype(jnp.float32), w_r.astype(jnp.float32),
            batch["intrinsics"].reshape(BT, 3, 3), batch["pose"].reshape(BT, 4, 4),
        )

        def field_fn(p):
            return model.apply(variables, repr_, p, origin, method=GenNerf.decode)["tsdf"][..., 0]

        depth_r, hit = ray_march_tsdf(
            field_fn, origins.reshape(B, -1, 3), dirs.reshape(B, -1, 3),
            near=dcfg.render_near, far=dcfg.render_far, n_steps=dcfg.render_steps,
            n_secant_steps=dcfg.render_secant, n_fine_steps=dcfg.render_fine,
        )
        assert bool(hit.any()), "no ray hit the init field - fixture broken"
        pts_r = origins.reshape(B, -1, 3) + dirs.reshape(B, -1, 3) * depth_r[..., None]
        tmap = model.teacher(batch["image"].reshape(BT, 3, H, W))
        trgt = sample_teacher_features(tmap, h_r, w_r, (H, W))
        mask = (ok_r & hit.reshape(BT, -1))[..., None].astype(jnp.float32)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                repr_, pts_r, origin, method=GenNerf.decode,
            )
            pred = out["feat_sem"].reshape(BT, dcfg.render_rays, -1)
            num = (pred * trgt).sum(-1, keepdims=True)
            den = jnp.maximum(
                jnp.linalg.norm(pred, axis=-1, keepdims=True)
                * jnp.linalg.norm(trgt, axis=-1, keepdims=True), 1e-6)
            m = (1.0 - num / den) * mask
            return m.sum() / jnp.maximum(mask.sum(), 1.0)

        tx = optax.adam(1e-3)
        params = state.params
        opt_state = tx.init(params)
        l0 = float(loss_fn(params))
        step_jit = jax.jit(
            lambda p, o: (lambda g: tx.update(g, o, p))(jax.grad(loss_fn)(p))
        )
        for _ in range(20):
            updates, opt_state = step_jit(params, opt_state)
            params = optax.apply_updates(params, updates)
        l1 = float(loss_fn(params))
        assert l1 < l0, (l0, l1)

    def test_render_distill_works_under_frustum_sampling(self, rng):
        """Surface-mode distillation requires ray sampling; render mode does
        its own pixel sampling and must run under frustum supervision too."""
        from gennerf_tpu.train.tasks import GenNerfTask

        task = GenNerfTask(self._cfg(sampling_mode="frustum"))
        batch = self._batch(rng)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
        assert "distill" in metrics
        assert np.isfinite(float(metrics["distill"]))

    def test_geometry_is_stop_gradient(self, rng):
        """The render-distill term must move the semantic head but leave the
        geometry head untouched when it is the ONLY loss (UNISURF
        appearance-at-fixed-geometry: no gradient through the march)."""
        import jax as _jax

        from gennerf_tpu.train.tasks import GenNerfTask

        cfg = self._cfg()
        # zero-weight (not disabled: calculate_loss requires a tsdf/isdf
        # term) so ONLY the distill gradient moves parameters
        cfg["loss"]["tsdf"] = {"weight": 0.0}
        task = GenNerfTask(cfg)
        batch = self._batch(rng)
        state = task.init_state(_jax.random.PRNGKey(0), batch)
        # PRNGKey(10): the engage test pins that this key yields hit rays
        new_state, metrics = task.run_train_step(state, batch, _jax.random.PRNGKey(10))
        assert float(metrics["distill"]) > 0.0, "fixture lost its hit rays"
        flat0 = _jax.tree_util.tree_leaves_with_path(state.params)
        flat1 = {
            _jax.tree_util.keystr(p): l
            for p, l in _jax.tree_util.tree_leaves_with_path(new_state.params)
        }
        moved, head_geo = [], []
        for path, leaf in flat0:
            name = _jax.tree_util.keystr(path)
            delta = float(jnp.abs(flat1[name] - leaf).max())
            if "head_geo" in name:
                head_geo.append((name, delta))
            else:
                moved.append((name, delta))
        # the shared MLP / encoder must receive gradient through feat_sem...
        assert moved and any(d > 0 for _, d in moved), "no parameter moved"
        # ...but the TSDF head must not: its only consumers are the march
        # (stop-gradient) and the disabled tsdf loss
        assert head_geo and all(d == 0 for _, d in head_geo), head_geo


class TestSurfaceRenderer:
    def test_ray_march_analytic_sphere(self):
        """March rays against an analytic sphere SDF; depths must match the
        closed-form intersection."""
        center = jnp.array([0.0, 0.0, 0.0])
        radius = 0.5

        def tsdf_fn(pts):  # (B, N, 3) -> (B, N)
            return jnp.linalg.norm(pts - center, axis=-1) - radius

        B, R = 1, 8
        origins = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (B, R, 1))
        # rays toward the sphere with slight angular offsets
        angles = jnp.linspace(-0.15, 0.15, R)
        dirs = jnp.stack([jnp.sin(angles), jnp.zeros(R), jnp.cos(angles)], -1)[None]
        depth, mask = ray_march_tsdf(tsdf_fn, origins, dirs, near=0.1, far=4.0,
                                     n_steps=64, n_secant_steps=8,
                                     convention="sdf")
        assert np.asarray(mask).all()
        # closed form: |o + t d| = r with |d|=1
        o = np.asarray(origins)[0, 0]
        for i in range(R):
            d = np.asarray(dirs)[0, i]
            b = np.dot(o, d)
            t_true = -b - np.sqrt(b**2 - (np.dot(o, o) - radius**2))
            assert abs(float(depth[0, i]) - t_true) < 2e-3

    def test_ray_march_fusion_convention_default(self):
        """DEFAULT convention marches fields shaped like the framework's
        own fused GT (tsdf/fusion.py:76: negative in observed free space,
        positive behind the surface) — what every trained decoder
        regresses. A fused-convention sphere must yield the same analytic
        depths the 'sdf' test gets from the classic field; this is the
        trained-checkpoint rendering path (a +->- march on these fields
        locks onto back-faces/hallucinated margins instead of the
        surface)."""
        center = jnp.array([0.0, 0.0, 0.0])
        radius = 0.5

        def fused_fn(pts):  # fusion convention: r - |p - c|
            return radius - jnp.linalg.norm(pts - center, axis=-1)

        B, R = 1, 8
        origins = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (B, R, 1))
        angles = jnp.linspace(-0.15, 0.15, R)
        dirs = jnp.stack([jnp.sin(angles), jnp.zeros(R), jnp.cos(angles)], -1)[None]
        depth, mask = ray_march_tsdf(fused_fn, origins, dirs, near=0.1, far=4.0,
                                     n_steps=64, n_secant_steps=8)
        assert np.asarray(mask).all()
        o = np.asarray(origins)[0, 0]
        for i in range(R):
            d = np.asarray(dirs)[0, i]
            b = np.dot(o, d)
            t_true = -b - np.sqrt(b**2 - (np.dot(o, o) - radius**2))
            assert abs(float(depth[0, i]) - t_true) < 2e-3

    def test_renderer_misses_marked(self):
        def tsdf_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - 0.2

        origins = jnp.array([[[0.0, 2.0, -2.0]]])  # ray passes far from sphere
        dirs = jnp.array([[[0.0, 0.0, 1.0]]])
        depth, mask = ray_march_tsdf(tsdf_fn, origins, dirs, convention="sdf")
        assert not bool(mask[0, 0])
        assert float(depth[0, 0]) == 0.0

    def test_render_pixels_features(self, rng):
        def decode_fn(pts):
            tsdf = (jnp.linalg.norm(pts, axis=-1) - 0.5)[..., None]
            feat = jnp.stack([pts[..., 0], pts[..., 1]], axis=-1)
            return {"tsdf": tsdf, "feat_sem": feat}

        renderer = SurfaceRenderer(decode_fn, near=0.1, far=5.0, n_steps=64,
                                   convention="sdf")
        K = jnp.asarray(np.array([[[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]]], np.float32))
        pose = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        pose = pose.at[0, 2, 3].set(-2.0)  # camera at z=-2 looking +z
        h = jnp.asarray([[12, 12]])
        w = jnp.asarray([[16, 17]])
        out = renderer.render_pixels(h, w, K, pose)
        assert bool(out.mask[0, 0])  # center pixel hits the sphere
        assert abs(float(out.depth[0, 0]) - 1.5) < 5e-3
        assert out.features.shape == (1, 2, 2)

    def test_render_depth_image_chunking_equivalence(self):
        """Chunked full-image rendering (n_max_network_queries bound) must
        equal the single-shot path exactly — the chunk body is the same
        marched program."""
        def decode_fn(pts):
            tsdf = (jnp.linalg.norm(pts, axis=-1) - 0.5)[..., None]
            return {"tsdf": tsdf, "feat_sem": pts[..., :1]}

        K = jnp.asarray(np.array([[[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]]], np.float32))
        pose = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        pose = pose.at[0, 2, 3].set(-2.0)
        H, W = 24, 32
        big = SurfaceRenderer(decode_fn, near=0.1, far=5.0, n_steps=16,
                              n_max_network_queries=1 << 20, convention="sdf")
        small = SurfaceRenderer(decode_fn, near=0.1, far=5.0, n_steps=16,
                                n_max_network_queries=16 * 100, convention="sdf")  # 100-px chunks (ragged tail)
        d_big = big.render_depth_image(K, pose, H, W)
        d_small = small.render_depth_image(K, pose, H, W)
        assert d_big.shape == (1, H, W)
        np.testing.assert_allclose(np.asarray(d_small), np.asarray(d_big), atol=1e-6)
        assert (np.asarray(d_big) > 0).any()

    def test_render_feature_image(self):
        """Full-image feature rendering: chunked == single-shot, features at
        hit pixels equal the decode at the surface point (here (x, y) of the
        sphere hit), and are 0 on missed rays."""
        def decode_fn(pts):
            tsdf = (jnp.linalg.norm(pts, axis=-1) - 0.5)[..., None]
            feat = jnp.stack([pts[..., 0], pts[..., 1]], axis=-1)
            return {"tsdf": tsdf, "feat_sem": feat}

        K = jnp.asarray(np.array([[[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]]], np.float32))
        pose = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        pose = pose.at[0, 2, 3].set(-2.0)
        H, W = 24, 32
        big = SurfaceRenderer(decode_fn, near=0.1, far=5.0, n_steps=16,
                              n_max_network_queries=1 << 20, convention="sdf")
        small = SurfaceRenderer(decode_fn, near=0.1, far=5.0, n_steps=16,
                                n_max_network_queries=16 * 100, convention="sdf")
        db, mb, fb = big.render_feature_image(K, pose, H, W)
        ds, ms, fs = small.render_feature_image(K, pose, H, W)
        assert fb.shape == (1, H, W, 2) and mb.shape == (1, H, W)
        np.testing.assert_allclose(np.asarray(fs), np.asarray(fb), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ms), np.asarray(mb))
        mb_np, db_np, fb_np = np.asarray(mb[0]), np.asarray(db[0]), np.asarray(fb[0])
        assert mb_np.any() and (~mb_np).any()
        # missed rays carry zero features
        assert np.all(fb_np[~mb_np] == 0.0)
        # the center pixel hits the sphere front pole: surface (x, y) ~ (0, 0)
        assert mb_np[12, 16]
        assert np.all(np.abs(fb_np[12, 16]) < 5e-3)
        # feature == decode at the surface point for every hit pixel
        hs, ws = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        from gennerf_tpu.models.renderer import pixels_to_rays

        o, d = pixels_to_rays(
            jnp.asarray(hs.reshape(1, -1), jnp.float32),
            jnp.asarray(ws.reshape(1, -1), jnp.float32), K, pose)
        pts = np.asarray(o + d * db.reshape(1, -1, 1))[0].reshape(H, W, 3)
        np.testing.assert_allclose(fb_np[mb_np], pts[mb_np][:, :2], atol=1e-5)


class TestAabbClippedMarch:
    def _sphere(self):
        center = jnp.array([0.0, 0.0, 0.0])

        def tsdf_fn(pts):
            return jnp.linalg.norm(pts - center, axis=-1) - 0.5

        return tsdf_fn

    def test_ray_aabb_clip_analytic(self):
        from gennerf_tpu.models.renderer import ray_aabb_clip

        origins = jnp.array([[[0.0, 0.0, -2.0], [0.0, 0.0, -2.0], [5.0, 0.0, -2.0]]])
        dirs = jnp.array([[[0.0, 0.0, 1.0],      # through the box
                           [1.0, 0.0, 0.0],      # parallel, misses
                           [0.0, 0.0, 1.0]]])    # offset, misses
        box = (jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
        t_near, t_far = ray_aabb_clip(origins, dirs, *box, near=0.1, far=10.0)
        np.testing.assert_allclose(float(t_near[0, 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(t_far[0, 0]), 3.0, atol=1e-6)
        # missed rays collapse to an empty interval at far
        assert float(t_near[0, 1]) == float(t_far[0, 1]) == 10.0
        assert float(t_near[0, 2]) == float(t_far[0, 2]) == 10.0

    def test_march_with_aabb_same_depths_and_miss_mask(self):
        """Box-clipped march reproduces the analytic sphere depths; rays
        that miss the box find no crossing by construction."""
        tsdf_fn = self._sphere()
        B, R = 1, 8
        origins = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (B, R, 1))
        angles = jnp.linspace(-0.15, 0.15, R)
        dirs = jnp.stack([jnp.sin(angles), jnp.zeros(R), jnp.cos(angles)], -1)[None]
        box = (jnp.array([-0.6, -0.6, -0.6]), jnp.array([0.6, 0.6, 0.6]))
        depth, mask = ray_march_tsdf(tsdf_fn, origins, dirs, near=0.1, far=4.0,
                                     n_steps=64, n_secant_steps=8,
                                     convention="sdf", aabb=box)
        assert np.asarray(mask).all()
        o = np.asarray(origins)[0, 0]
        for i in range(R):
            d = np.asarray(dirs)[0, i]
            b = np.dot(o, d)
            t_true = -b - np.sqrt(b**2 - (np.dot(o, o) - 0.25))
            assert abs(float(depth[0, i]) - t_true) < 2e-3
        # a ray pointing away from the box never hits
        away = jnp.array([[[0.0, 0.0, -1.0]]])
        _, miss = ray_march_tsdf(tsdf_fn, origins[:, :1], away, near=0.1,
                                 far=4.0, n_steps=64, n_secant_steps=8,
                                 convention="sdf", aabb=box)
        assert not bool(miss[0, 0])

    def test_aabb_concentrates_budget(self):
        """At a starved sample budget (8 coarse steps over far=10), the
        box-clipped march still resolves the sphere to sub-mm while the
        unclipped march's bracket is ~10x coarser."""
        tsdf_fn = self._sphere()
        origins = jnp.array([[[0.0, 0.0, -2.0]]])
        # angled ray: the SDF profile along it is nonlinear, so bracket
        # width shows up in the secant result (a center ray's profile is
        # exactly linear and any bracket converges)
        a = 0.18
        dirs = jnp.array([[[np.sin(a), 0.0, np.cos(a)]]], dtype=jnp.float32)
        o = np.array([0.0, 0.0, -2.0])
        d = np.array([np.sin(a), 0.0, np.cos(a)])
        b = np.dot(o, d)
        t_true = -b - np.sqrt(b**2 - (np.dot(o, o) - 0.25))
        box = (jnp.array([-0.6, -0.6, -0.6]), jnp.array([0.6, 0.6, 0.6]))
        kw = dict(near=0.1, far=10.0, n_steps=8, n_secant_steps=2,
                  n_fine_steps=0, convention="sdf")
        d_clip, m_clip = ray_march_tsdf(tsdf_fn, origins, dirs, aabb=box, **kw)
        d_free, m_free = ray_march_tsdf(tsdf_fn, origins, dirs, **kw)
        assert bool(m_clip[0, 0])
        err_clip = abs(float(d_clip[0, 0]) - t_true)
        assert err_clip < 1e-3, err_clip
        if bool(m_free[0, 0]):
            assert err_clip < abs(float(d_free[0, 0]) - t_true)


class TestHierarchicalMarch:
    def test_sphere_depth_matches_closed_form(self):
        """The coarse->fine march (24+8 evals) reaches the analytic sphere
        depth as accurately as the 64-step uniform march at ~half the field
        evaluations."""
        radius = 0.5

        def tsdf_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - radius

        B, R = 1, 8
        origins = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (B, R, 1))
        angles = jnp.linspace(-0.15, 0.15, R)
        dirs = jnp.stack([jnp.sin(angles), jnp.zeros(R), jnp.cos(angles)], -1)[None]
        depth, mask = ray_march_tsdf(tsdf_fn, origins, dirs, near=0.1, far=4.0,
                                     n_steps=24, n_secant_steps=8,
                                     n_fine_steps=8, convention="sdf")
        assert np.asarray(mask).all()
        o = np.asarray(origins)[0, 0]
        for i in range(R):
            d = np.asarray(dirs)[0, i]
            b = np.dot(o, d)
            t_true = -b - np.sqrt(b**2 - (np.dot(o, o) - radius**2))
            assert abs(float(depth[0, i]) - t_true) < 2e-3

    def test_hierarchical_equals_uniform_on_smooth_field(self):
        def tsdf_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - 0.5

        origins = jnp.array([[[0.0, 0.2, -2.0]]])
        dirs = jnp.array([[[0.0, 0.0, 1.0]]])
        d_uni, m_uni = ray_march_tsdf(tsdf_fn, origins, dirs, n_steps=64,
                                      n_secant_steps=8, convention="sdf")
        d_hier, m_hier = ray_march_tsdf(tsdf_fn, origins, dirs, n_steps=24,
                                        n_secant_steps=8, n_fine_steps=8,
                                        convention="sdf")
        assert bool(m_uni[0, 0]) == bool(m_hier[0, 0]) == True
        assert abs(float(d_uni[0, 0]) - float(d_hier[0, 0])) < 1e-3
