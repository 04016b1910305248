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
