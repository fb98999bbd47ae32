"""Weight-import parity: a hand-built torch MC3 trunk (torchvision video
ResNet semantics) vs VideoResNetFeatures with converted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from llmmil_tpu.models import VideoResNetFeatures
from llmmil_tpu.models.torch_import import convert_mc3_state_dict


def _conv3x3(inp, out, temporal, stride):
    if temporal:
        return tnn.Conv3d(inp, out, (3, 3, 3), (stride,) * 3,
                          (1, 1, 1), bias=False)
    return tnn.Conv3d(inp, out, (1, 3, 3), (1, stride, stride),
                      (0, 1, 1), bias=False)


class _Block(tnn.Module):
    def __init__(self, inp, out, temporal, stride):
        super().__init__()
        self.conv1 = tnn.Sequential(_conv3x3(inp, out, temporal, stride),
                                    tnn.BatchNorm3d(out), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            _conv3x3(out, out, temporal, 1), tnn.BatchNorm3d(out))
        self.downsample = None
        if stride != 1 or inp != out:
            s = (stride,) * 3 if temporal else (1, stride, stride)
            self.downsample = tnn.Sequential(
                tnn.Conv3d(inp, out, 1, s, bias=False),
                tnn.BatchNorm3d(out))
        self.relu = tnn.ReLU()

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        r = self.downsample(x) if self.downsample is not None else x
        return self.relu(r + y)


class _MC3Trunk(tnn.Module):
    """Mirrors torchvision mc3_18 incl. its state_dict key layout."""

    def __init__(self, layers=(2, 2, 2, 2), chans=(64, 128, 256, 512)):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3), bias=False),
            tnn.BatchNorm3d(64), tnn.ReLU())
        temporal = (True, False, False, False)
        inp = 64
        for i, (n, c, t) in enumerate(zip(layers, chans, temporal)):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(_Block(inp, c, t, stride))
                inp = c
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.stem(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


def test_mc3_weight_import_parity():
    torch.manual_seed(0)
    # small config to keep the 1-core CPU run fast: 1 block/stage
    layers = (1, 1, 1, 1)
    trunk = _MC3Trunk(layers=layers).eval()
    sd = trunk.state_dict()

    x = torch.randn(1, 3, 4, 16, 16)
    with torch.no_grad():
        want = trunk(x).numpy()                      # (1, C, D, H, W)

    params, stats = convert_mc3_state_dict(sd, layers=layers)
    model = VideoResNetFeatures(layers=layers, remat=False)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))   # NDHWC
    got = model.apply({"params": params, "batch_stats": stats}, x_j,
                      train=False)
    got_ncdhw = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_ncdhw, want, atol=2e-4)


# ---- MedicalNet ResNet-101 (layer1/2) importer ------------------------------

class _MNBottleneck(tnn.Module):
    """MedicalNet bottleneck (Tencent models/resnet.py naming: bare
    conv1/bn1/.../downsample attributes, stride on conv2)."""

    def __init__(self, inp, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv3d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm3d(planes)
        self.conv2 = tnn.Conv3d(planes, planes, 3, (stride,) * 3, 1,
                                bias=False)
        self.bn2 = tnn.BatchNorm3d(planes)
        self.conv3 = tnn.Conv3d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm3d(planes * 4)
        self.downsample = None
        if stride != 1 or inp != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(inp, planes * 4, 1, (stride,) * 3, bias=False),
                tnn.BatchNorm3d(planes * 4))
        self.relu = tnn.ReLU()

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = self.downsample(x) if self.downsample is not None else x
        return self.relu(r + y)


class _MedicalNetMini(tnn.Module):
    def __init__(self, layers=(1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv3d(1, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm3d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool3d(3, 2, padding=1)
        inp = 64
        for i, (n, planes) in enumerate(zip(layers, (64, 128))):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(_MNBottleneck(inp, planes, stride))
                inp = planes * 4
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer2(self.layer1(x))


def test_medicalnet_weight_import_parity():
    from llmmil_tpu.models.ct_mc3 import MedicalNetFeatures
    from llmmil_tpu.models.torch_import import convert_medicalnet_state_dict

    torch.manual_seed(1)
    layers = (1, 1)
    net = _MedicalNetMini(layers).eval()
    # run a training step's worth of BN stat drift so running stats ≠ init
    with torch.no_grad():
        for p in net.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {("module." + k): v for k, v in net.state_dict().items()}  # DataParallel prefix

    x = torch.randn(1, 1, 8, 32, 32)
    with torch.no_grad():
        want = net(x).numpy()                        # (1, 512, 1, 4, 4)

    params, stats = convert_medicalnet_state_dict(sd, layers=layers)
    model = MedicalNetFeatures(layers=layers)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got = model.apply({"params": params, "batch_stats": stats}, x_j,
                      train=False)
    got_ncdhw = np.asarray(got).transpose(0, 4, 1, 2, 3)
    assert got_ncdhw.shape == want.shape
    np.testing.assert_allclose(got_ncdhw, want, atol=2e-4)


# ---- R(2+1)D-18 importer ----------------------------------------------------
# Hand-built torch mirror of torchvision video/resnet.py's r2plus1d_18
# (Conv2Plus1D Sequential layout incl. the ReLU hole at index 2, block
# midplanes computed once from (inplanes, planes)), wrapped with the
# reference's 1→3ch stem + replaced fc head (model/dim3/resnet2plus1D.py).

class _C2P1(tnn.Sequential):
    def __init__(self, inp, out, mid, stride=1):
        super().__init__(
            tnn.Conv3d(inp, mid, (1, 3, 3), (1, stride, stride),
                       (0, 1, 1), bias=False),
            tnn.BatchNorm3d(mid), tnn.ReLU(),
            tnn.Conv3d(mid, out, (3, 1, 1), (stride, 1, 1),
                       (1, 0, 0), bias=False))


class _R2Block(tnn.Module):
    def __init__(self, inp, out, stride):
        super().__init__()
        mid = (inp * out * 3 * 3 * 3) // (inp * 3 * 3 + 3 * out)
        self.conv1 = tnn.Sequential(_C2P1(inp, out, mid, stride),
                                    tnn.BatchNorm3d(out), tnn.ReLU())
        self.conv2 = tnn.Sequential(_C2P1(out, out, mid),
                                    tnn.BatchNorm3d(out))
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(inp, out, 1, (stride,) * 3, bias=False),
                tnn.BatchNorm3d(out))
        self.relu = tnn.ReLU()

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        r = self.downsample(x) if self.downsample is not None else x
        return self.relu(r + y)


class _R2P1Trunk(tnn.Module):
    """torchvision r2plus1d_18 with the reference's replaced fc head."""

    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3), bias=False),
            tnn.BatchNorm3d(45), tnn.ReLU(),
            tnn.Conv3d(45, 64, (3, 1, 1), 1, (1, 0, 0), bias=False),
            tnn.BatchNorm3d(64), tnn.ReLU())
        inp = 64
        for i, (n, c) in enumerate(zip(layers, (64, 128, 256, 512))):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(_R2Block(inp, c, stride))
                inp = c
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Sequential(tnn.Linear(512, 512), tnn.ReLU(),
                                 tnn.Linear(512, 512), tnn.ReLU())

    def forward(self, x):
        x = self.stem(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


def _randomize_bn_stats(mod, gen):
    for m in mod.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.uniform_(-0.3, 0.3, generator=gen)
            m.running_var.uniform_(0.6, 1.5, generator=gen)


def test_r2plus1d_weight_import_parity():
    from llmmil_tpu.models.ct_r2plus1d import Resnet2plus1D_18
    from llmmil_tpu.models.torch_import import convert_r2plus1d_18

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    layers = (1, 1, 1, 1)
    downsampling = tnn.Conv3d(1, 3, (3, 2, 2), (1, 2, 2), (1, 0, 0))
    trunk = _R2P1Trunk(layers=layers)
    _randomize_bn_stats(trunk, gen)
    downsampling.eval()
    trunk.eval()

    x = torch.randn(1, 1, 8, 32, 32)
    with torch.no_grad():
        want = trunk(downsampling(x)).numpy()            # (1, 512)

    params, stats = convert_r2plus1d_18(
        trunk.state_dict(),
        {"weight": downsampling.weight, "bias": downsampling.bias},
        layers=layers)
    model = Resnet2plus1D_18(remat=False, temporal_mode="conv3d",
                             layers=layers)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))    # NDHWC
    got = model.apply({"params": params, "batch_stats": stats}, x_j,
                      train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
    # the folded temporal lowering serves the same imported weights
    got_fold = Resnet2plus1D_18(
        remat=False, temporal_mode="dfold", fwd_lowering="fold",
        layers=layers).apply({"params": params, "batch_stats": stats},
                             x_j, train=False)
    np.testing.assert_allclose(np.asarray(got_fold), want, atol=2e-4)


def test_r2plus1d_full_depth_tree_matches_init():
    """Converted full-depth (2,2,2,2) tree is leaf-for-leaf identical in
    paths AND shapes to the flax init tree (so merge_reference_checkpoint
    can overwrite every leaf for model_CT='resnet2plus1d_18')."""
    from llmmil_tpu.models.ct_r2plus1d import Resnet2plus1D_18
    from llmmil_tpu.models.torch_import import convert_r2plus1d_18

    torch.manual_seed(0)
    downsampling = tnn.Conv3d(1, 3, (3, 2, 2), (1, 2, 2), (1, 0, 0))
    trunk = _R2P1Trunk(layers=(2, 2, 2, 2))
    params, stats = convert_r2plus1d_18(
        trunk.state_dict(),
        {"weight": downsampling.weight, "bias": downsampling.bias})

    model = Resnet2plus1D_18(remat=False, temporal_mode="conv3d")
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 32, 32, 1), jnp.float32),
                           train=False))

    def flat(tree, pre=""):
        out = {}
        for k, v in tree.items():
            key = f"{pre}/{k}" if pre else k
            if isinstance(v, dict):
                out.update(flat(v, key))
            else:
                out[key] = tuple(v.shape)
        return out

    want_p = flat(shapes["params"])
    got_p = flat(jax.tree_util.tree_map(np.asarray, params))
    assert got_p == want_p
    want_s = flat(shapes["batch_stats"])
    got_s = flat(jax.tree_util.tree_map(np.asarray, stats))
    assert got_s == want_s
