"""Evaluation metrics + native rasterizer tests on analytic geometry."""
import numpy as np
import pytest

from gennerf_tpu.eval.metrics import eval_depth, eval_mesh, eval_tsdf
from gennerf_tpu.utils.mesh import Mesh


def icosphere(radius=0.5, center=(0, 0, 0), n=12):
    """Simple UV-sphere mesh."""
    thetas = np.linspace(0, np.pi, n)
    phis = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append([
                np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)
            ])
    verts = np.array(verts) * radius + np.asarray(center)
    faces = []
    P = len(phis)
    for i in range(n - 1):
        for j in range(P):
            a = i * P + j
            b = i * P + (j + 1) % P
            c = (i + 1) * P + j
            d = (i + 1) * P + (j + 1) % P
            faces += [[a, b, c], [b, d, c]]
    return Mesh(verts, np.array(faces))


class TestMeshMetrics:
    def test_identical_meshes_perfect_score(self):
        m = icosphere()
        out = eval_mesh(m, m, threshold=0.05)
        assert out["prec"] == 1.0 and out["recal"] == 1.0 and out["fscore"] == 1.0
        assert out["dist1"] < 1e-6

    def test_shifted_mesh_degrades(self):
        m1 = icosphere()
        m2 = icosphere(center=(0.2, 0, 0))
        out = eval_mesh(m1, m2, threshold=0.05)
        assert out["fscore"] < 1.0
        assert 0.0 < out["dist1"] < 0.25

    def test_fscore_threshold_sensitivity(self):
        m1 = icosphere()
        m2 = icosphere(center=(0.03, 0, 0))
        tight = eval_mesh(m1, m2, threshold=0.01)
        loose = eval_mesh(m1, m2, threshold=0.10)
        assert loose["fscore"] > tight["fscore"]


class TestTsdfL1:
    def test_masked_l1(self):
        trgt = np.ones((4, 4, 4), np.float32)
        trgt[0, 0, :] = 0.2  # only observed region
        pred = np.zeros((4, 4, 4), np.float32)
        out = eval_tsdf(pred, trgt)
        assert out["l1"] == pytest.approx(0.2)


class TestTsdfCrossGrid:
    def test_mismatched_grids_resample_world_aligned(self):
        """eval_tsdf with pred/target on DIFFERENT grids: pred is resampled
        at the target's voxel centers in world space (GT-less predict sizes
        from voxel_dim_test, so grids legitimately differ)."""
        from gennerf_tpu.tsdf import TSDF

        def sphere_tsdf(origin, vs, shape, linspace=False):
            # decoded volumes live on the reference's linspace grid
            # (spacing vs*n/(n-1)); fused GT uses arange*vs
            ax = [
                origin[a]
                + (vs * shape[a] / (shape[a] - 1) if linspace else vs)
                * np.arange(shape[a])
                for a in range(3)
            ]
            gx, gy, gz = np.meshgrid(*ax, indexing="ij")
            d = np.sqrt(gx**2 + gy**2 + gz**2) - 0.5
            return np.clip(d / 0.12, -1, 1).astype(np.float32)

        # fine prediction grid (decode convention), coarser shifted target
        po, pvs, pshape = np.array([-1.0, -1.0, -1.0]), 0.05, (40, 40, 40)
        to, tvs, tshape = np.array([-0.9, -0.85, -0.8]), 0.08, (22, 21, 20)
        pred = TSDF(np.float32(pvs), po.astype(np.float32),
                    sphere_tsdf(po, pvs, pshape, linspace=True))
        trgt = TSDF(np.float32(tvs), to.astype(np.float32), sphere_tsdf(to, tvs, tshape))
        m = eval_tsdf(pred, trgt)
        # same underlying SDF -> only interpolation error remains
        assert m["l1"] < 0.05, m

        # raw arrays of different shapes cannot align -> explicit error
        with pytest.raises(ValueError):
            eval_tsdf(np.zeros((4, 4, 4)), np.zeros((5, 5, 5)))

    def test_equal_shape_different_origin_still_resamples(self):
        """Shape equality is not grid identity: same-shape volumes with
        different origins must go through the world-aligned resample, not
        a raw voxel-to-voxel compare."""
        from gennerf_tpu.tsdf import TSDF

        shape = (12, 12, 12)
        vs = 0.1

        def sphere(origin, linspace=False):
            ax = [origin[a] + (vs * shape[a] / (shape[a] - 1) if linspace else vs)
                  * np.arange(shape[a]) for a in range(3)]
            gx, gy, gz = np.meshgrid(*ax, indexing="ij")
            return np.clip((np.sqrt(gx**2 + gy**2 + gz**2) - 0.4) / 0.12,
                           -1, 1).astype(np.float32)

        o1 = np.array([-0.6, -0.6, -0.6], np.float32)
        o2 = o1 + np.float32(0.25)
        pred = TSDF(np.float32(vs), o1, sphere(o1, linspace=True))
        trgt = TSDF(np.float32(vs), o2, sphere(o2))
        aligned = eval_tsdf(pred, trgt)["l1"]
        # a naive voxel-to-voxel compare of the shifted volumes is much worse
        naive = float(np.abs(np.asarray(pred.tsdf_vol) - np.asarray(trgt.tsdf_vol))[
            np.asarray(trgt.tsdf_vol) < 1].mean())
        assert aligned < 0.08 < naive, (aligned, naive)

    def test_out_of_bounds_region_counts_as_unobserved(self):
        from gennerf_tpu.tsdf import TSDF

        # tiny pred volume far away from the target: resample -> all 1.0
        pred = TSDF(np.float32(0.1), np.array([10.0, 10, 10], np.float32),
                    np.zeros((4, 4, 4), np.float32))
        tvol = np.full((6, 6, 6), 0.5, np.float32)
        trgt = TSDF(np.float32(0.1), np.zeros(3, np.float32), tvol)
        m = eval_tsdf(pred, trgt)
        assert m["l1"] == pytest.approx(0.5)


class TestDepthMetrics:
    def test_perfect_prediction(self):
        d = np.random.default_rng(0).random((10, 12)).astype(np.float32) + 0.5
        m = eval_depth(d, d)
        assert m["AbsRel"] == 0 and m["RMSE"] == 0 and m["r1"] == 1.0
        assert m["complete"] == 1.0

    def test_scaled_prediction(self):
        d = np.full((10, 10), 2.0, np.float32)
        m = eval_depth(d * 1.1, d)
        assert m["AbsRel"] == pytest.approx(0.1, rel=1e-5)
        assert m["r1"] == 1.0  # 1.1 < 1.25


class TestRasterizer:
    def test_sphere_depth_matches_analytic(self):
        from gennerf_tpu.data.synthetic import look_at_pose, render_scene
        from gennerf_tpu.eval.evaluation import render_mesh_depth

        H, W = 60, 80
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
        pose = look_at_pose([2.0, 0, 0.5], [0, 0, 0.5])
        mesh = icosphere(radius=0.5, center=(0, 0, 0.5), n=48)
        d_mesh = render_mesh_depth(mesh, K, pose, H, W)
        d_true, _ = render_scene(H, W, K, pose, sphere_center=(0, 0, 0.5),
                                 sphere_radius=0.5, floor_z=-100)
        both = (d_mesh > 0) & (d_true > 0)
        assert both.mean() > 0.05
        err = np.abs(d_mesh[both] - d_true[both])
        # coarse mesh discretization bounds the error
        assert np.median(err) < 0.02
