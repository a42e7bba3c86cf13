"""Import harness for the UPSTREAM reference network (test oracle only).

The reference (`/root/reference/dro_sfm`) depends on torchvision, which is
not installed here. This module installs a minimal, API-compatible shim
for the handful of torchvision symbols the reference's import chain touches
(`networks/optim/extractor.py:1-5`, `utils/depth.py:4`) so the *actual*
reference model code can be imported and run side-by-side against the TPU
rebuild in parity tests. Nothing from the reference is copied — it is
imported read-only from its own tree.

`torch.utils.model_zoo.load_url` is replaced with a deterministic random
resnet18 state-dict factory: the reference encoders construct with
``pretrained=True`` and would otherwise hit the network
(`extractor.py:56-65`). Weight *values* don't matter for parity tests — the
torch state dict is converted and grafted onto the flax model either way.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


class _BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (public API replica)."""
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """torchvision.models.ResNet replica (construction API only)."""

    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)


def _fake_resnet18_state_dict(seed: int = 0) -> dict:
    """Random weights shaped like the torchvision resnet18 state dict."""
    rng = np.random.default_rng(seed)
    ref = _ResNet(_BasicBlock, [2, 2, 2, 2])
    sd = {}
    for k, v in ref.state_dict().items():
        if "running_var" in k:
            sd[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        elif "num_batches_tracked" in k:
            sd[k] = v
        else:
            sd[k] = torch.from_numpy(
                rng.normal(0, 0.1, tuple(v.shape)).astype(np.float32))
    return sd


def install() -> None:
    """Install the torchvision shim and put the reference on sys.path."""
    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")
    # Tests that want REAL torchvision (e.g. the vgg16 percep oracle) must
    # be able to tell this minimal shim apart and skip.
    tv.__is_dro_sfm_shim__ = True
    models = types.ModuleType("torchvision.models")
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    transforms = types.ModuleType("torchvision.transforms")

    resnet_mod.BasicBlock = _BasicBlock
    resnet_mod.Bottleneck = _Bottleneck
    resnet_mod.model_urls = {f"resnet{n}": f"shim://resnet{n}"
                             for n in (18, 34, 50, 101)}
    models.ResNet = _ResNet
    models.resnet = resnet_mod
    tv.models = models
    tv.transforms = transforms

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet_mod
    sys.modules["torchvision.transforms"] = transforms

    if "yacs" not in sys.modules:
        try:
            import yacs  # noqa: F401
        except ImportError:
            # `dro_sfm.utils.types.is_cfg` only type-checks against
            # yacs.config.CfgNode — a sentinel class suffices.
            yacs_mod = types.ModuleType("yacs")
            yacs_cfg = types.ModuleType("yacs.config")
            yacs_cfg.CfgNode = type("CfgNode", (dict,), {})
            yacs_mod.config = yacs_cfg
            sys.modules["yacs"] = yacs_mod
            sys.modules["yacs.config"] = yacs_cfg

    if "numpy.lib.type_check" not in sys.modules:
        # numpy 2.x removed `numpy.lib.type_check`; the reference's
        # photometric loss has a dead `from numpy.lib.type_check import
        # imag` at `losses/multiview_photometric_loss_mf.py:2`.
        tc = types.ModuleType("numpy.lib.type_check")
        tc.imag = np.imag
        tc.real = np.real
        sys.modules["numpy.lib.type_check"] = tc

    import torch.utils.model_zoo as model_zoo
    model_zoo.load_url = lambda url, **kw: _fake_resnet18_state_dict()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def patch_cpu_device() -> None:
    """Make the reference geometry CPU-safe.

    `MultiViewPhotometricDecayLoss.warp_ref_image` moves cameras to
    `ref_image.get_device()` (`multiview_photometric_loss_mf.py:156-163`),
    which is -1 for CPU tensors and crashes `Tensor.to`. Wrap `Camera.to`
    to treat a negative device index as "stay put" so the loss oracle runs
    on CPU. Idempotent."""
    install()
    from dro_sfm.geometry import camera as ref_camera
    if getattr(ref_camera.Camera.to, "__is_cpu_patch__", False):
        return
    orig = ref_camera.Camera.to

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], int) and args[0] < 0:
            return self
        return orig(self, *args, **kwargs)

    to.__is_cpu_patch__ = True
    ref_camera.Camera.to = to


def load_reference_depth_pose_net(version: str, min_depth: float = 0.1,
                                  max_depth: float = 100.0):
    """Construct the actual reference DepthPoseNet (random weights)."""
    install()
    from dro_sfm.networks.depth_pose.DepthPoseNet import DepthPoseNet
    torch.manual_seed(0)
    return DepthPoseNet(version=version, min_depth=min_depth,
                        max_depth=max_depth)
