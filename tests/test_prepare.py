"""Data-prep pipeline test: synthetic .sens container -> export -> info.json
-> GT fusion -> loadable dataset. Covers the offline L1 layer end-to-end."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def raw_scannet(tmp_path_factory):
    """Fabricate a raw ScanNet-layout scene from synthetic renders, packed
    into a real .sens container."""
    from gennerf_tpu.data.prepare.sensor_data import SensorData
    from gennerf_tpu.data.synthetic import look_at_pose, render_scene

    root = tmp_path_factory.mktemp("raw")
    scene_dir = root / "scans" / "scene9999_00"
    scene_dir.mkdir(parents=True)

    H, W = 48, 64
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    depths, colors, poses = [], [], []
    for i in range(6):
        a = 2 * np.pi * i / 6
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3], [0, 0, 0.5])
        d, c = render_scene(H, W, K, pose)
        depths.append((d * 1000).astype(np.uint16))
        colors.append(c)
        poses.append(pose)
    SensorData.write(
        str(scene_dir / "scene9999_00.sens"), K,
        np.stack(depths), np.stack(colors), np.stack(poses),
    )
    return str(root)


class TestSensPipeline:
    def test_sens_roundtrip(self, raw_scannet):
        from gennerf_tpu.data.prepare.sensor_data import SensorData

        sd = SensorData(os.path.join(raw_scannet, "scans/scene9999_00/scene9999_00.sens"))
        assert len(sd.frames) == 6
        assert sd.depth_shift == 1000.0
        depth = np.frombuffer(
            sd.frames[0].decompress_depth(sd.depth_compression_type), np.uint16
        ).reshape(sd.depth_height, sd.depth_width)
        assert depth.max() > 1000  # meters-scale depths in mm
        color = sd.frames[0].decompress_color(sd.color_compression_type)
        assert color.shape == (48, 64, 3)
        pose = sd.frames[0].camera_to_world
        np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=1e-6)

    def test_full_prep_chain(self, raw_scannet, tmp_path):
        """read_scannet CLI -> prepare_scannet (info.json + fused GT) ->
        loadable by SceneDataset."""
        out = str(tmp_path / "exported")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "read_scannet.py"),
             "--path", raw_scannet, "--output", out, "--workers", "1"],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr
        scene_dir = os.path.join(out, "scans", "scene9999_00")
        assert os.path.exists(os.path.join(scene_dir, "color", "0.jpg"))
        assert os.path.exists(os.path.join(scene_dir, "depth", "0.png"))
        assert os.path.exists(os.path.join(scene_dir, "poses", "0.txt"))
        assert os.path.exists(os.path.join(scene_dir, "scene9999_00.txt"))

        from gennerf_tpu.data.prepare.prepare_data import clean_info, fuse_scene
        from gennerf_tpu.data.prepare.scannet import prepare_scannet_scene

        meta = str(tmp_path / "meta")
        prepare_scannet_scene("scans/scene9999_00", out, meta, verbose=0)
        info_path = os.path.join(meta, "scans", "scene9999_00", "info.json")
        assert os.path.exists(info_path)
        # frames point at exported files via temp paths; fuse from them
        info = json.load(open(info_path))
        for frame in info["frames"]:  # prep reads from the export location
            frame["file_name_image"] = frame["file_name_image_temp"]
            frame["file_name_depth"] = frame["file_name_depth_temp"]
        json.dump(info, open(info_path, "w"))

        fuse_scene(meta, "scans/scene9999_00", 16, verbose=0, max_depth=5.0)
        clean_info("scans/scene9999_00", meta)

        info = json.load(open(info_path))
        assert "file_name_vol_16" in info
        assert "file_name_image_temp" not in info["frames"][0]

        from gennerf_tpu.tsdf import TSDF

        tsdf = TSDF.load(info["file_name_vol_16"])
        vol = np.asarray(tsdf.tsdf_vol)
        assert (vol < 0).any() and (vol > 0).any()  # surface captured
        mesh_path = os.path.join(meta, "scans/scene9999_00", "mesh_16.ply")
        assert os.path.getsize(mesh_path) > 1000
