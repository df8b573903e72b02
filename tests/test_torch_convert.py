"""Pretrained-tower conversion: numerical parity torch -> flax.

Builds a torchvision-topology ResNet18 in raw torch (torchvision itself is
not installed), runs it on a fixed input, converts the state_dict with
utils/torch_convert, and checks the flax tower reproduces the activations —
the §7 'weight conversion + numerical parity' risk item.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from deepviewagg_tpu.modules.image_encoders import ResNet18  # noqa: E402
from deepviewagg_tpu.utils.torch_convert import convert_resnet18  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64),
                                     TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2),
                                     TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2),
                                     TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2),
                                     TorchBasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


def test_resnet18_conversion_parity(rng):
    torch.manual_seed(0)
    tm = TorchResNet18().eval()
    # randomize BN stats so the test exercises them
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.6, 1.4)

    x = rng.normal(size=(2, 3, 64, 96)).astype(np.float32)  # NCHW torch
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()               # [2, 512, 2, 3]

    params, stats = convert_resnet18(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    )
    model = ResNet18(out_level=4, norm="batch")
    # our layout: [N, W, H, C] with x = width; torch NCHW (H, W) -> ours (W, H)
    xin = np.transpose(x, (0, 3, 2, 1))
    variables = model.init(jax.random.PRNGKey(0), xin, train=False)
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, xin, train=False
    ))
    got_nchw = np.transpose(got, (0, 3, 2, 1))
    # bf16 conv compute: expect ~1e-2 agreement
    err = np.abs(got_nchw - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 3e-2, err
