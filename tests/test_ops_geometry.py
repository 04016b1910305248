"""Golden tests for the geometry op library against numpy/torch oracles.

torch (CPU) is used purely as a test oracle for grid_sample semantics —
the framework itself never imports torch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gennerf_tpu import ops


def make_camera(rng, B=2, H=24, W=32):
    """Random-ish plausible intrinsics + pose."""
    intrinsics = np.zeros((B, 3, 3), np.float32)
    poses = np.zeros((B, 4, 4), np.float32)
    for b in range(B):
        fx, fy = 30 + 5 * rng.random(), 30 + 5 * rng.random()
        intrinsics[b] = [[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]]
        # small random rotation around z + translation
        a = 0.3 * rng.random()
        R = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
            np.float32,
        )
        t = rng.random(3).astype(np.float32)
        poses[b, :3, :3] = R
        poses[b, :3, 3] = t
        poses[b, 3, 3] = 1
    # world->image projection = K @ inv(pose)[:3]
    proj = np.einsum("bij,bjk->bik", intrinsics, np.linalg.inv(poses)[:, :3])
    return intrinsics, poses, proj.astype(np.float32)


class TestCoords:
    def test_coordinates_order(self):
        c = np.asarray(ops.coordinates((2, 3, 4)))
        assert c.shape == (3, 24)
        # x-major: index = x*ny*nz + y*nz + z
        assert tuple(c[:, 0]) == (0, 0, 0)
        assert tuple(c[:, 1]) == (0, 0, 1)
        assert tuple(c[:, 4]) == (0, 1, 0)
        assert tuple(c[:, 12]) == (1, 0, 0)

    def test_normalize_coordinate_planes(self, rng):
        p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 10, 3)).astype(np.float32))
        for plane, axes in [("xz", (0, 2)), ("xy", (0, 1)), ("yz", (1, 2))]:
            out = np.asarray(ops.normalize_coordinate(p, 0.1, plane))
            ref = np.asarray(p)[..., axes] / (1 + 0.1 + 10e-6) + 0.5
            ref = np.clip(ref, 0.0, 1 - 10e-6)
            np.testing.assert_allclose(out, ref, rtol=1e-6)
            assert out.min() >= 0 and out.max() < 1

    def test_coordinate2index(self, rng):
        x = jnp.asarray(rng.uniform(0, 1 - 1e-6, (2, 50, 2)).astype(np.float32))
        idx = np.asarray(ops.coordinate2index(x, 128))
        ref = (np.asarray(x) * 128).astype(np.int64)
        np.testing.assert_array_equal(idx, ref[..., 0] + 128 * ref[..., 1])
        assert idx.min() >= 0 and idx.max() < 128 * 128


class TestProjection:
    def test_unproject_project_roundtrip(self, rng):
        """Unprojected pixels must re-project to the same pixel coords.

        Tolerances are float32-inverse-limited (~0.05 px) — the torch
        reference has the identical f32 matrix-inverse path.
        """
        B, H, W = 2, 24, 32
        _, _, proj = make_camera(rng, B, H, W)
        depth = (0.5 + 2 * rng.random((B, H, W))).astype(np.float32)
        pts = ops.get_3d_points(jnp.asarray(depth), jnp.asarray(proj))
        pts = np.asarray(pts)
        assert pts.shape == (B, H, W, 3)
        # project back (float64 projection of the f32 points)
        hom = np.concatenate([pts, np.ones_like(pts[..., :1])], -1).astype(np.float64)
        cam = np.einsum("bij,bhwj->bhwi", proj.astype(np.float64), hom)
        u = cam[..., 0] / cam[..., 2]
        v = cam[..., 1] / cam[..., 2]
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        np.testing.assert_allclose(u, uu[None].repeat(B, 0), atol=0.3)
        np.testing.assert_allclose(v, vv[None].repeat(B, 0), atol=0.3)
        np.testing.assert_allclose(cam[..., 2], depth, atol=1e-2)

    def test_unproject_parity_with_torch_f32(self, rng):
        """Strict parity: same float32 inverse-based math as the reference."""
        B, H, W = 2, 12, 16
        _, _, proj = make_camera(rng, B, H, W)
        depth = (0.5 + 2 * rng.random((B, H, W))).astype(np.float32)
        ours = np.asarray(ops.get_3d_points(jnp.asarray(depth), jnp.asarray(proj)))

        # torch oracle (reference utils.py:120-175 math)
        tp = torch.from_numpy(proj)
        bottom = torch.tensor([0.0, 0, 0, 1]).expand(B, 1, 4)
        inv = torch.inverse(torch.cat([tp, bottom], 1))
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        uv1 = torch.from_numpy(np.stack([uu, vv, np.ones_like(uu)], -1))[None]
        p2 = uv1 * torch.from_numpy(depth)[..., None]
        p2h = torch.cat([p2, torch.ones_like(p2[..., :1])], -1)
        p3h = torch.einsum("bij,bhwj->bhwi", inv, p2h)
        ref = (p3h[..., :3] / p3h[..., 3:]).numpy()
        # both sides are float32-LU-limited; they use different factorization
        # orders, so agreement is at the ~1e-2 absolute level
        np.testing.assert_allclose(ours, ref, atol=2e-2)

    def test_depth_to_world_matches_get_3d_points(self, rng):
        _, _, proj = make_camera(rng, 1, 8, 10)
        depth = (0.5 + rng.random((8, 10))).astype(np.float32)
        a = np.asarray(ops.depth_to_world(jnp.asarray(proj[0]), jnp.asarray(depth)))
        b = np.asarray(ops.get_3d_points(jnp.asarray(depth[None]), jnp.asarray(proj)))[0]
        np.testing.assert_allclose(a.T.reshape(8, 10, 3), b, rtol=1e-4, atol=1e-4)

    def test_backproject_against_reference_semantics(self, rng):
        """Oracle: scatter loop re-implemented in numpy (reference utils.py:948)."""
        B, C, H, W = 2, 5, 16, 20
        voxel_dim = (8, 6, 4)
        voxel_size = 0.25
        origin = np.array([-0.5, -0.4, 0.1], np.float32)
        _, _, proj = make_camera(rng, B, H, W)
        feats = rng.standard_normal((B, C, H, W)).astype(np.float32)

        vol, valid = ops.backproject(
            voxel_dim, voxel_size, jnp.asarray(origin), jnp.asarray(proj), jnp.asarray(feats)
        )
        vol, valid = np.asarray(vol), np.asarray(valid)

        # numpy oracle (f32 throughout to match device arithmetic & rounding)
        coords = np.asarray(ops.coordinates(voxel_dim)).astype(np.float32)
        world = coords * np.float32(voxel_size) + origin[:, None]
        world = np.concatenate([world, np.ones_like(world[:1])], 0)
        for b in range(B):
            cam = proj[b] @ world
            px = np.round(cam[0] / cam[2]).astype(int)
            py = np.round(cam[1] / cam[2]).astype(int)
            ok = (px >= 0) & (py >= 0) & (px < W) & (py < H) & (cam[2] > 0)
            V = np.prod(voxel_dim)
            ref = np.zeros((C, V), np.float32)
            ref[:, ok] = feats[b][:, py[ok], px[ok]]
            np.testing.assert_allclose(vol[b].reshape(C, V), ref, rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(valid[b].reshape(V), ok.astype(np.float32))


class TestInterpolation:
    def test_grid_sample_2d_vs_torch(self, rng):
        B, C, IH, IW, H, W = 2, 3, 9, 11, 5, 7
        img = rng.standard_normal((B, C, IH, IW)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, (B, H, W, 2)).astype(np.float32)
        ours = np.asarray(ops.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
        ref = F.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid),
            mode="bilinear", padding_mode="border", align_corners=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_grid_sample_2d_nearest_vs_torch(self, rng):
        B, C, IH, IW, H, W = 1, 2, 7, 8, 4, 3
        img = rng.standard_normal((B, C, IH, IW)).astype(np.float32)
        # keep away from .5 boundaries where round ties differ
        grid = (rng.uniform(-0.9, 0.9, (B, H, W, 2)) // 0.01 * 0.01 + 0.003).astype(np.float32)
        ours = np.asarray(ops.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), mode="nearest"))
        ref = F.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid),
            mode="nearest", padding_mode="border", align_corners=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_grid_sample_3d_vs_torch(self, rng):
        B, C, ID, IH, IW, N = 2, 4, 5, 6, 7, 40
        vol = rng.standard_normal((B, C, ID, IH, IW)).astype(np.float32)
        grid = rng.uniform(-1.2, 1.2, (B, N, 3)).astype(np.float32)
        ours = np.asarray(ops.grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid)))
        ref = F.grid_sample(
            torch.from_numpy(vol), torch.from_numpy(grid).view(B, N, 1, 1, 3),
            mode="bilinear", padding_mode="border", align_corners=True,
        ).numpy().reshape(B, C, N)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_trilinear_interpolation_vs_torch_reference_path(self, rng):
        """Oracle = the exact reference composition (model.py:999-1042):
        permute to (B,C,nz,ny,nx) and torch grid_sample."""
        B, nx, ny, nz, C, N = 2, 6, 5, 4, 3, 50
        vol = rng.standard_normal((B, nx, ny, nz, C)).astype(np.float32)
        origin = np.array([0.3, -0.2, 0.1], np.float32)
        voxel_size = 0.2
        xyz = (origin + rng.uniform(0, 1, (B, N, 3)) *
               np.array([nx, ny, nz]) * voxel_size).astype(np.float32)

        ours = np.asarray(
            ops.trilinear_interpolation(
                jnp.asarray(vol), jnp.asarray(xyz), jnp.asarray(origin), voxel_size
            )
        )

        t_vol = torch.from_numpy(vol).permute(0, 4, 3, 2, 1)  # (B, C, nz, ny, nx)
        t_xyz = torch.from_numpy(xyz)
        t_norm = (t_xyz - torch.from_numpy(origin)) / (
            torch.tensor([nx, ny, nz], dtype=torch.float32) * voxel_size
        )
        t_norm = 2 * t_norm - 1
        ref = F.grid_sample(
            t_vol, t_norm.view(B, N, 1, 1, 3),
            mode="bilinear", align_corners=True, padding_mode="border",
        ).view(B, C, N).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_trilinear_second_order_grad(self, rng):
        """Eikonal needs d²/dx² through the gather — must not error or NaN."""
        vol = jnp.asarray(rng.standard_normal((1, 5, 5, 5, 1)).astype(np.float32))
        origin = jnp.zeros(3)

        def f(p):
            return ops.trilinear_interpolation(vol, p[None, None], origin, 0.3)[0, 0, 0]

        p0 = jnp.array([0.7, 0.6, 0.5])
        g = jax.grad(f)(p0)
        h = jax.jacfwd(jax.grad(f))(p0)
        assert np.isfinite(np.asarray(g)).all()
        assert np.isfinite(np.asarray(h)).all()

    def test_sample_plane_feature_matches_scatter_layout(self, rng):
        """A feature scattered at cell (x0,x1) must be recovered by sampling
        exactly at that cell's coordinates."""
        reso = 16
        B, C = 1, 4
        # one point per distinct cell
        p = jnp.asarray(rng.uniform(-0.4, 0.4, (B, 8, 3)).astype(np.float32))
        pn = ops.normalize_coordinate(p, 0.1, "xz")
        idx = ops.coordinate2index(pn, reso)
        feats = jnp.asarray(rng.standard_normal((B, 8, C)).astype(np.float32))
        plane = ops.scatter_to_plane(feats, idx, reso, reduce="sum")
        # sample at cell centers: coordinate (i + .5)/reso normalized -> pixel i
        cell = (jnp.asarray(idx)[..., None] % reso, jnp.asarray(idx)[..., None] // reso)
        coords = jnp.concatenate(
            [(cell[0] + 0.5) / reso, (cell[1] + 0.5) / reso], axis=-1
        ).astype(jnp.float32)
        # nearest sampling at centers returns the scattered value
        out = ops.sample_plane_feature(plane, coords, mode="nearest")
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats), rtol=1e-5, atol=1e-5)


class TestScatter:
    def test_segment_mean_max(self, rng):
        B, N, C, S = 2, 100, 3, 10
        vals = rng.standard_normal((B, N, C)).astype(np.float32)
        idx = rng.integers(0, S, (B, N))
        mean = np.asarray(ops.segment_mean(jnp.asarray(vals), jnp.asarray(idx), S))
        mx = np.asarray(ops.segment_max(jnp.asarray(vals), jnp.asarray(idx), S))
        for b in range(B):
            for s in range(S):
                sel = vals[b][idx[b] == s]
                if len(sel):
                    np.testing.assert_allclose(mean[b, s], sel.mean(0), rtol=1e-4, atol=1e-5)
                    np.testing.assert_allclose(mx[b, s], sel.max(0), rtol=1e-5)
                else:
                    np.testing.assert_array_equal(mean[b, s], 0)
                    np.testing.assert_array_equal(mx[b, s], 0)

    def test_pool_and_gather(self, rng):
        B, N, C, S = 1, 20, 2, 4
        vals = rng.standard_normal((B, N, C)).astype(np.float32)
        idx = rng.integers(0, S, (B, N))
        out = np.asarray(ops.pool_and_gather(jnp.asarray(vals), jnp.asarray(idx), S, "max"))
        for n in range(N):
            sel = vals[0][idx[0] == idx[0, n]]
            np.testing.assert_allclose(out[0, n], sel.max(0), rtol=1e-5)


class TestSampling:
    def test_valid_depth_pixels_only_valid(self, rng):
        depth = rng.random((2, 10, 12)).astype(np.float32)
        depth[depth < 0.6] = 0  # ~60% invalid
        key = jax.random.PRNGKey(0)
        b, h, w, ok = ops.sample_valid_depth_pixels(key, jnp.asarray(depth), 20)
        assert np.asarray(ok).all()
        d = depth[np.asarray(b), np.asarray(h), np.asarray(w)]
        assert (d > 0).all()
        # no duplicate pixels within a row (sampling w/o replacement)
        flat = np.asarray(h) * 12 + np.asarray(w)
        for row in flat:
            assert len(set(row.tolist())) == len(row)

    def test_ray_sampler_geometry(self, rng):
        """Surface sample (index 0) must reproject onto the sampled pixel ray
        at its depth."""
        B, H, W = 2, 16, 20
        intr, pose, _ = make_camera(rng, B, H, W)
        n_rays, N, M = 5, 4, 3
        key = jax.random.PRNGKey(1)
        h_idxs = jnp.asarray(rng.integers(0, H, (B, n_rays)))
        w_idxs = jnp.asarray(rng.integers(0, W, (B, n_rays)))
        depths = jnp.asarray((1 + rng.random((B, n_rays))).astype(np.float32))
        xyz, z = ops.sample_points_on_rays(
            key, h_idxs, w_idxs, depths, jnp.asarray(intr), jnp.asarray(pose),
            N=N, M=M, delta=0.1, min_dist=0.07, sigma=0.1,
        )
        assert xyz.shape == (B, n_rays, 1 + N + M, 3)
        # z[..., 0] == surface depth
        np.testing.assert_allclose(np.asarray(z)[..., 0], np.asarray(depths), rtol=1e-6)
        # surface point: camera-space z equals depth, pixel coords match
        surf = np.asarray(xyz)[:, :, 0]  # (B, R, 3)
        for b in range(B):
            inv = np.linalg.inv(pose[b])
            cam = (inv[:3, :3] @ surf[b].T + inv[:3, 3:4]).T
            np.testing.assert_allclose(cam[:, 2], np.asarray(depths)[b], rtol=1e-4)
            u = intr[b, 0, 0] * cam[:, 0] / cam[:, 2] + intr[b, 0, 2]
            v = intr[b, 1, 1] * cam[:, 1] / cam[:, 2] + intr[b, 1, 2]
            np.testing.assert_allclose(u, np.asarray(w_idxs)[b], atol=1e-3)
            np.testing.assert_allclose(v, np.asarray(h_idxs)[b], atol=1e-3)
        # stratified samples span [min_dist, D+delta]
        np.testing.assert_allclose(np.asarray(z)[..., 1], 0.07, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(z)[..., N], np.asarray(depths) + 0.1, rtol=1e-5
        )

    def test_frustum_sampler_in_range(self, rng):
        B, H, W = 1, 16, 20
        intr, pose, _ = make_camera(rng, B, H, W)
        key = jax.random.PRNGKey(2)
        h = jnp.asarray(rng.integers(0, H, (B, 50)))
        w = jnp.asarray(rng.integers(0, W, (B, 50)))
        xyz, z = ops.sample_points_in_frustum(
            key, h, w, jnp.asarray(intr), jnp.asarray(pose), 0.5, 4.0
        )
        zn = np.asarray(z)
        assert (zn >= 0.5).all() and (zn <= 4.0).all()

    def test_fps_matches_reference_given_same_start(self, rng):
        """Oracle: the reference's sequential FPS loop in numpy, forced to the
        same random start index."""
        B, N, npoint = 2, 64, 8
        xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
        key = jax.random.PRNGKey(3)
        sampled, centroids = ops.farthest_point_sample(key, jnp.asarray(xyz), npoint)
        start = np.asarray(centroids)[:, 0]

        for b in range(B):
            dist = np.full(N, 1e10, np.float32)
            far = start[b]
            cent = []
            for i in range(npoint):
                cent.append(far)
                d = ((xyz[b] - xyz[b, far]) ** 2).sum(-1)
                dist = np.minimum(dist, d)
                far = int(dist.argmax())
            np.testing.assert_array_equal(np.asarray(centroids)[b], cent)
            np.testing.assert_allclose(np.asarray(sampled)[b], xyz[b][cent])

    def test_bounds_pc_batch_vs_reference(self, rng):
        """Oracle: reference bounds_pc_batch re-implemented densely in numpy."""
        B, R, S = 2, 6, 5
        pc = rng.standard_normal((B, R, S, 3)).astype(np.float32)
        z = rng.random((B, R, S)).astype(np.float32)
        d = rng.random((B, R)).astype(np.float32)
        bounds, grad = ops.bounds_pc_batch(jnp.asarray(pc), jnp.asarray(z), jnp.asarray(d))
        surf = pc[:, :, 0]  # (B, R, 3)
        for b in range(B):
            diff = pc[b][:, :, None] - surf[b][None, None]  # (R, S, R, 3)
            dist = np.linalg.norm(diff, axis=-1)
            mn = dist.min(-1)
            ix = dist.argmin(-1)
            behind = z[b] > d[b][:, None]
            expect = np.where(behind, -mn, mn)
            np.testing.assert_allclose(np.asarray(bounds)[b], expect, rtol=1e-4, atol=1e-5)
            g = np.take_along_axis(diff, ix[..., None, None], 2)[:, :, 0][:, 1:]
            g = g / np.linalg.norm(g, axis=-1, keepdims=True)
            g = np.where(behind[:, 1:, None], -g, g)
            np.testing.assert_allclose(np.asarray(grad)[b], g, rtol=1e-3, atol=1e-5)


class TestValueTransforms:
    def test_log_transform(self, rng):
        x = jnp.asarray(rng.standard_normal(100).astype(np.float32))
        out = np.asarray(ops.log_transform(x, 1.0))
        ref = np.sign(np.asarray(x)) * np.log1p(np.abs(np.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_smooth_log_vs_torch(self, rng):
        x = torch.randn(200)
        ref = (torch.tanh(x) * F.softplus(x.abs() / 20.0, beta=8.0)).numpy()
        ours = np.asarray(ops.smooth_log_transform(jnp.asarray(x.numpy()), 20.0, 8.0))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_gaussian_smoothing_vs_torch(self, rng):
        img = rng.standard_normal((1, 2, 12, 14)).astype(np.float32)
        k, s = 5, 1.0
        ours = np.asarray(ops.apply_gaussian_smoothing(jnp.asarray(img), k, s))
        # torch oracle: 2D conv with outer-product kernel (reference math)
        x = torch.linspace(-(k // 2), k // 2, k)
        g1 = torch.exp(-x.pow(2) / (2 * s**2))
        g1 /= g1.sum()
        g2 = torch.outer(g1, g1)[None, None].repeat(2, 1, 1, 1)
        ref = F.conv2d(torch.from_numpy(img), g2, padding=k // 2, groups=2).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestNormals:
    def test_normals_on_plane(self):
        """Points on the z=const plane -> normals ±z."""
        H, W = 12, 12
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        pts = np.stack([xs * 0.1, ys * 0.1, np.ones_like(xs)], -1)
        n = np.asarray(ops.estimate_pointcloud_normals(jnp.asarray(pts)))
        interior = n[3:-3, 3:-3]
        assert np.isfinite(interior).all()
        np.testing.assert_allclose(np.abs(interior[..., 2]), 1.0, atol=1e-5)

    def test_select_formulation_matches_gather_oracle(self):
        """The TPU-friendly one-hot select formulation must match the
        original take_along_axis formulation (numpy oracle) pixel-for-pixel
        on a point map with NaN holes — including which pixels come out
        NaN (undefined normals)."""
        rng = np.random.default_rng(0)
        H, W, d = 20, 24, 2
        pts = rng.standard_normal((H, W, 3)).astype(np.float32)
        pts[rng.random((H, W)) < 0.15] = np.nan  # invalid-depth holes

        ours = np.asarray(ops.estimate_pointcloud_normals(jnp.asarray(pts)))

        lookups = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
        padded = np.full((H + 2 * d, W + 2 * d, 3), np.nan, np.float32)
        padded[d:-d, d:-d] = pts

        def shifted(k):
            dy, dx = lookups[k]
            return padded[d + dy * d : d + dy * d + H, d + dx * d : d + dx * d + W]

        p2 = np.stack([shifted(k) for k in range(8)])
        p3 = np.stack([shifted((k + 2) % 8) for k in range(8)])
        with np.errstate(invalid="ignore"):
            diff = np.linalg.norm(p2 - pts[None], axis=-1) + np.linalg.norm(
                p3 - pts[None], axis=-1)
            diff = np.where(np.isnan(diff), np.inf, diff)
            best = diff.argmin(0)
            sel2 = np.take_along_axis(p2, best[None, :, :, None], axis=0)[0]
            sel3 = np.take_along_axis(p3, best[None, :, :, None], axis=0)[0]
            oracle = np.cross(sel2 - pts, sel3 - pts)
            oracle = oracle / np.linalg.norm(oracle, axis=-1, keepdims=True)

        np.testing.assert_array_equal(np.isnan(ours), np.isnan(oracle))
        ok = ~np.isnan(oracle)
        np.testing.assert_allclose(ours[ok], oracle[ok], rtol=1e-5, atol=1e-6)
