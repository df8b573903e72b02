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


def test_ppm_head_conversion_parity():
    """A torch PPMDeepsup-shaped head (MIT-semseg structure the reference
    strips to ppm+conv_last, image.py:659-720) must produce matching
    activations through our PPM module after conversion.  Input sizes are
    divisible by every bin so torch AdaptiveAvgPool2d and our fixed-window
    pooling coincide."""
    import numpy as np
    import torch
    import torch.nn as tnn

    import jax

    from deepviewagg_tpu.modules.image_encoders import PPM
    from deepviewagg_tpu.utils.torch_convert import convert_ppm_head

    torch.manual_seed(0)
    fc_dim, out, scales = 64, 96, (1, 2, 3, 6)
    ppm_t = tnn.ModuleList([
        tnn.Sequential(
            tnn.AdaptiveAvgPool2d(s),
            tnn.Conv2d(fc_dim, out, 1, bias=False),
            tnn.BatchNorm2d(out),
            tnn.ReLU(inplace=True),
        ) for s in scales
    ])
    conv_last_t = tnn.Sequential(
        tnn.Conv2d(fc_dim + len(scales) * out, out, 3, padding=1, bias=False),
        tnn.BatchNorm2d(out),
        tnn.ReLU(inplace=True),
    )
    for m in list(ppm_t.modules()) + list(conv_last_t.modules()):
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(); m.running_var.uniform_(0.5, 1.5)
    ppm_t.eval(); conv_last_t.eval()

    x = torch.randn(2, fc_dim, 12, 24)
    with torch.no_grad():
        feats = [x]
        for s, mod in zip(scales, ppm_t):
            y = mod(x)
            feats.append(torch.nn.functional.interpolate(
                y, size=x.shape[2:], mode="bilinear", align_corners=False))
        # repo image layout is [N, W, H, C] (x = width), like the trunk test
        ref = conv_last_t(torch.cat(feats, 1)).permute(0, 3, 2, 1).numpy()

    sd = {}
    for i, mod in enumerate(ppm_t):
        sd[f"ppm.{i}.1.weight"] = mod[1].weight.detach().numpy()
        for k, v in mod[2].state_dict().items():
            sd[f"ppm.{i}.2.{k}"] = v.numpy()
    sd["conv_last.0.weight"] = conv_last_t[0].weight.detach().numpy()
    for k, v in conv_last_t[1].state_dict().items():
        sd[f"conv_last.1.{k}"] = v.numpy()
    params, stats = convert_ppm_head(sd)

    model = PPM(out_channels=out, norm="batch")
    x_j = jax.numpy.asarray(x.permute(0, 3, 2, 1).numpy())
    variables = model.init(jax.random.PRNGKey(0), x_j, train=False)
    got = model.apply(
        {"params": params, "batch_stats": stats}, x_j, train=False)
    # bf16 conv compute (Conv2dWS): expect ~1e-2 relative agreement, same
    # criterion as the trunk parity test above
    err = np.abs(np.asarray(got) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-2, err


def test_mit_deep_stem_conversion_parity():
    """MIT-semseg ADE20K encoders use a 3-conv deep stem (the reference's
    layer0, image.py:832-840); convert_resnet18 must detect it via
    conv3.weight and the deep_stem tower must reproduce torch activations."""
    torch.manual_seed(1)
    stem_t = tnn.Sequential(
        tnn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False),
        tnn.BatchNorm2d(64), tnn.ReLU(inplace=True),
        tnn.Conv2d(64, 64, 3, padding=1, bias=False),
        tnn.BatchNorm2d(64), tnn.ReLU(inplace=True),
        tnn.Conv2d(64, 128, 3, padding=1, bias=False),
        tnn.BatchNorm2d(128), tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2, padding=1),
    )
    for m in stem_t.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1); m.running_var.uniform_(0.6, 1.4)
    stem_t.eval()

    x = torch.randn(2, 3, 32, 48)
    with torch.no_grad():
        ref = stem_t(x).permute(0, 3, 2, 1).numpy()   # -> [N, W, H, C]

    sd = {}
    for i, ci in enumerate((0, 3, 6)):
        sd[f"conv{i+1}.weight"] = stem_t[ci].weight.detach().numpy()
        for k, v in stem_t[ci + 1].state_dict().items():
            sd[f"bn{i+1}.{k}"] = v.numpy()
    params, stats = convert_resnet18(sd, out_level=0)

    model = ResNet18(out_level=0, norm="batch", deep_stem=True)
    xin = np.transpose(x.numpy(), (0, 3, 2, 1))
    model.init(jax.random.PRNGKey(0), xin, train=False)
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, xin, train=False))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 3e-2, err
