"""Numerical parity: flax C4 backbone == torch eval-mode ResNet.

Builds a minimal torch ResNet with torchvision's exact module naming
(torchvision itself is not installed), converts its state_dict with
tspn_tpu.detection.torch_weights, and compares forward outputs — the
guarantee that real pretrained checkpoints port correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tspn_tpu.detection.resnet import Res5Head, ResNetC4Backbone  # noqa: E402
from tspn_tpu.detection.torch_weights import convert_torch_resnet, fold_bn  # noqa: E402


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, mid, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(identity + y)


class TorchResNet26(tnn.Module):
    """Depth-26 (one bottleneck per stage) with torchvision naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(TorchBottleneck(64, 64, 256, stride=1))
        self.layer2 = tnn.Sequential(TorchBottleneck(256, 128, 512, stride=2))
        self.layer3 = tnn.Sequential(TorchBottleneck(512, 256, 1024, stride=2))
        self.layer4 = tnn.Sequential(TorchBottleneck(1024, 512, 2048, stride=2))

    def forward_c4(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        return self.layer3(x)

    def forward_res5(self, x):
        return self.layer4(x)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchResNet26().eval()
    # non-trivial BN statistics so folding is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    return model


def test_fold_bn_matches_torch_eval():
    torch.manual_seed(1)
    bn = tnn.BatchNorm2d(4).eval()
    with torch.no_grad():
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-1, 1)
    x = torch.randn(1, 4, 3, 3)
    want = bn(x).detach().numpy()
    scale, bias = fold_bn(
        bn.weight.detach(), bn.bias.detach(),
        bn.running_mean, bn.running_var,
    )
    got = x.numpy() * scale[None, :, None, None] + bias[None, :, None, None]
    assert np.allclose(got, want, atol=1e-5)


def test_backbone_matches_torch(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    backbone_params, res5_params = convert_torch_resnet(sd, depth=26)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want_c4 = (
            torch_model.forward_c4(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1).numpy()
        )
    flax_model = ResNetC4Backbone(depth=26)
    got_c4 = np.asarray(
        flax_model.apply({"params": backbone_params}, jnp.asarray(x))
    )
    assert got_c4.shape == want_c4.shape
    assert np.allclose(got_c4, want_c4, atol=2e-4), np.abs(got_c4 - want_c4).max()


def test_res5_head_matches_torch(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    _, res5_params = convert_torch_resnet(sd, depth=26)

    feat = np.random.RandomState(1).rand(2, 14, 14, 1024).astype(np.float32)
    with torch.no_grad():
        out = torch_model.forward_res5(
            torch.from_numpy(feat).permute(0, 3, 1, 2)
        )
        want = out.mean(dim=(2, 3)).numpy()  # global average pool
    head = Res5Head(depth=26)
    got = np.asarray(head.apply({"params": res5_params}, jnp.asarray(feat)))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()
