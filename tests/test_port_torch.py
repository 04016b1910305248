"""ResNet weight-port parity: a torch ResNet18 (torchvision topology, built
manually — torchvision itself isn't installed) ported into the flax
ResNetStages must reproduce its eval-mode features."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from gennerf_tpu.models.resnet import ResNetStages
from gennerf_tpu.utils.port_torch import port_resnet_state_dict


class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class TorchResNet18Stem(tnn.Module):
    """conv1..layer2 of torchvision resnet18 (enough for num_stages=2)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        feats = [x]
        x = self.maxpool(x)
        x = self.layer1(x)
        feats.append(x)
        x = self.layer2(x)
        feats.append(x)
        return feats


def test_port_resnet18_feature_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchResNet18Stem().eval()
    # give BN non-trivial running stats
    with torch.no_grad():
        for _ in range(3):
            tmodel.train()(torch.randn(4, 3, 32, 32))
        tmodel.eval()

    x = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x))

    fmodel = ResNetStages(backbone="resnet18", num_stages=2)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3)), train=False)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = port_resnet_state_dict(sd, "resnet18", num_stages=2)

    # merge ported subtrees into the flax variables (shape-checked)
    import copy

    new_params = copy.deepcopy(jax.tree.map(np.asarray, variables["params"]))
    new_stats = copy.deepcopy(jax.tree.map(np.asarray, variables["batch_stats"]))

    def merge(dst, src):
        for k, v in src.items():
            assert k in dst, f"missing {k} in flax tree ({list(dst)})"
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert np.shape(dst[k]) == np.shape(v), (k, np.shape(dst[k]), np.shape(v))
                dst[k] = np.asarray(v, np.float32)

    merge(new_params, params)
    merge(new_stats, stats)

    ffeats = fmodel.apply(
        {"params": new_params, "batch_stats": new_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    assert len(ffeats) == len(tfeats)
    for tf, ff in zip(tfeats, ffeats):
        ref = tf.numpy()
        ours = np.asarray(ff).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_port_weights_cli_end_to_end(rng, tmp_path):
    """torch .pth -> scripts/port_weights.py -> npz -> GenNerfTask init with
    encoder.spatial.pretrained_path: the init tree must carry the ported
    ImageNet-style weights and the spatial encode must run (VERDICT #7)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import port_weights as pw_cli

    torch.manual_seed(1)
    tmodel = TorchResNet18Stem().eval()
    with torch.no_grad():
        for _ in range(2):
            tmodel.train()(torch.randn(2, 3, 32, 32))
        tmodel.eval()
    pth = str(tmp_path / "resnet18.pth")
    torch.save(tmodel.state_dict(), pth)

    npz = str(tmp_path / "resnet18_flax.npz")
    pw_cli.main(["backbone", pth, npz, "--backbone", "resnet18",
                 "--num-stages", "2"])
    assert os.path.exists(npz)

    from gennerf_tpu.train.tasks import GenNerfTask

    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": True, "use_pointnet": False,
                    "spatial": {"backbone": "resnet18", "num_layers": 3,
                                "blur_image": False, "pretrained_path": npz}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
    }
    task = GenNerfTask(cfg)
    batch = {
        "projection": rng.standard_normal((1, 2, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((1, 2, 3, 16, 16)).astype(np.float32),
        "depth": (rng.random((1, 2, 16, 16)) + 0.5).astype(np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1)),
        "intrinsics": np.tile((np.eye(3) * 10).astype(np.float32), (1, 2, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (1, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    state = task.init_state(jax.random.PRNGKey(0), batch)
    conv1 = np.asarray(state.params["spatial"]["resnet"]["conv1"]["kernel"])
    ref = tmodel.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(conv1, ref)
    bn_mean = np.asarray(state.batch_stats["spatial"]["resnet"]["bn1"]["mean"])
    np.testing.assert_allclose(bn_mean, tmodel.bn1.running_mean.numpy(), rtol=1e-6)
    # training still steps with the grafted weights
    _, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["combined"]))


def test_fabricated_backbone_grafts_end_to_end(rng, tmp_path):
    """`random:<backbone>` fabrication (the offline stand-in for ImageNet
    bytes — scripts/port_weights.py) produces a torchvision-shaped state
    dict whose port grafts cleanly onto the real resnet34 spatial config
    used by the seqs_multigeo_spatial drive (num_layers=4 -> 3 stages)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import port_weights as pw_cli

    npz = str(tmp_path / "resnet34_fab.npz")
    pw_cli.main(["backbone", "random:resnet34", npz, "--num-stages", "3"])

    from gennerf_tpu.train.tasks import GenNerfTask

    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": True, "use_pointnet": False,
                    "spatial": {"backbone": "resnet34", "num_layers": 4,
                                "blur_image": False, "pretrained_path": npz}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
    }
    task = GenNerfTask(cfg)
    batch = {
        "projection": rng.standard_normal((1, 2, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((1, 2, 3, 16, 16)).astype(np.float32),
        "depth": (rng.random((1, 2, 16, 16)) + 0.5).astype(np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1)),
        "intrinsics": np.tile((np.eye(3) * 10).astype(np.float32), (1, 2, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (1, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    state = task.init_state(jax.random.PRNGKey(0), batch)
    # the grafted conv1 is the fabricated He-init tensor, not flax's default
    from port_weights import fabricate_resnet_state_dict

    fab = fabricate_resnet_state_dict("resnet34")
    conv1 = np.asarray(state.params["spatial"]["resnet"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        conv1, fab["conv1.weight"].transpose(2, 3, 1, 0))
    # fabricating the deepest kept stage matched too (layer3 first block)
    k = np.asarray(
        state.params["spatial"]["resnet"]["layer3_0"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        k, fab["layer3.0.conv1.weight"].transpose(2, 3, 1, 0))
    _, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["combined"]))
