"""Import the read-only reference implementation (/root/reference) as a
numerical oracle for parity tests.  Test-only; the framework never touches
this.  The reference needs kornia (not installed) and JIT-compiled CUDA ops
(no GPU here), so both are stubbed with equivalent pure-torch versions
before import; the StyleGan_Trans package's stale `src.hl_autoencoders`
imports (SURVEY.md 2.2) are aliased to the real package path.
"""

import sys
import types
from pathlib import Path

import pytest
import torch
import torch.nn.functional as F
from torch import nn

REFERENCE = Path("/root/reference")


def _stub_kornia():
    if "kornia" in sys.modules:
        return

    class Normalize(nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.mean, self.std = mean, std

        def forward(self, x):
            return (x - self.mean) / self.std

    class Denormalize(nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.mean, self.std = mean, std

        def forward(self, x):
            return x * self.std + self.mean

    def normalize(x, mean, std):
        shape = (1, -1, 1, 1) if mean.numel() > 1 else ()
        return (x - mean.reshape(shape)) / std.reshape(shape) if shape else (x - mean) / std

    def denormalize(x, mean, std):
        shape = (1, -1, 1, 1) if mean.numel() > 1 else ()
        return x * std.reshape(shape) + mean.reshape(shape) if shape else x * std + mean

    def gaussian_blur2d(x, kernel_size, sigma):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(sigma, tuple):
            sigma = sigma[0]
        ks = kernel_size[0]
        xs = torch.arange(ks, dtype=torch.float32) - ks // 2
        if ks % 2 == 0:
            xs = xs + 0.5
        g = torch.exp(-xs ** 2 / (2 * sigma ** 2))
        g = g / g.sum()
        c = x.shape[1]
        pad = ((ks - 1) // 2, ks // 2, (ks - 1) // 2, ks // 2)
        x = F.pad(x, pad, mode="reflect")
        kh = g.view(1, 1, ks, 1).repeat(c, 1, 1, 1)
        kw = g.view(1, 1, 1, ks).repeat(c, 1, 1, 1)
        x = F.conv2d(x, kh, groups=c)
        return F.conv2d(x, kw, groups=c)

    def resize(x, size, **kw):
        if isinstance(size, int):
            size = (size, size)
        return F.interpolate(x, size=size, mode="bilinear", align_corners=False)

    kornia = types.ModuleType("kornia")
    enhance = types.ModuleType("kornia.enhance")
    filters = types.ModuleType("kornia.filters")
    geometry = types.ModuleType("kornia.geometry")
    enhance.Normalize, enhance.Denormalize = Normalize, Denormalize
    enhance.normalize, enhance.denormalize = normalize, denormalize
    filters.gaussian_blur2d = gaussian_blur2d
    geometry.resize = resize
    kornia.enhance, kornia.filters, kornia.geometry = enhance, filters, geometry
    for name, mod in [("kornia", kornia), ("kornia.enhance", enhance),
                      ("kornia.filters", filters), ("kornia.geometry", geometry)]:
        sys.modules[name] = mod


def _stub_stylegan_ops():
    """Replace the CUDA-JIT op packages with pure-torch equivalents
    (semantics of op/upfirdn2d.py:150-184 and op/fused_act.py:72-85)."""

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        b, c, h, w = input.shape
        out = input.reshape(-1, h, w, 1)
        out = out.view(-1, h, 1, w, 1, 1)
        out = F.pad(out, [0, 0, 0, up - 1, 0, 0, 0, up - 1])
        out = out.view(-1, h * up, w * up, 1)
        out = F.pad(out, [0, 0, max(pad[0], 0), max(pad[1], 0),
                          max(pad[0], 0), max(pad[1], 0)])
        out = out[:, max(-pad[0], 0): out.shape[1] - max(-pad[1], 0),
                  max(-pad[0], 0): out.shape[2] - max(-pad[1], 0), :]
        out = out.permute(0, 3, 1, 2)
        kh, kw = kernel.shape
        wt = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw).to(out.dtype)
        out = F.conv2d(out, wt)
        out = out[:, :, ::down, ::down]
        oh, ow = out.shape[2], out.shape[3]
        return out.view(b, c, oh, ow)

    def fused_leaky_relu(input, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            rest = input.ndim - bias.ndim - 1
            input = input + bias.view(1, bias.shape[0], *([1] * rest))
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(input, self.bias, self.negative_slope, self.scale)

    for base in ("src.mlvgms_autoencoders.StyleGan_E4E.stylegan2.op",
                 "src.hl_autoencoders.StyleGan_Trans.models.stylegan2.op",
                 "src.mlvgms_autoencoders.StyleGan_Trans.models.stylegan2.op"):
        mod = types.ModuleType(base)
        mod.upfirdn2d = upfirdn2d
        mod.fused_leaky_relu = fused_leaky_relu
        mod.FusedLeakyReLU = FusedLeakyReLU
        sys.modules[base] = mod


def _stub_torchvision():
    """torchvision is not installed; the reference's classifier module
    imports its model factories at import time (classifier/model.py:4).
    Provide structural replicas (tests/torch_refs.py) so reference modules
    that merely transit that import (e.g. defenses/loading_utils.py) load."""
    if "torchvision" in sys.modules:
        return
    from tests.torch_refs import TVResNet, TVVgg

    VGG11_PLAN = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")

    def resnet50(**kw):
        return TVResNet((3, 4, 6, 3), n_classes=1000)

    def vgg11_bn(**kw):
        return TVVgg(VGG11_PLAN, n_classes=1000)

    def resnext50_32x4d(**kw):
        return TVResNet((3, 4, 6, 3), n_classes=1000, groups=32, base_width=4)

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.resnet50 = resnet50
    models.vgg11_bn = vgg11_bn
    models.resnext50_32x4d = resnext50_32x4d

    class _Weights:
        DEFAULT = None

    models.ResNet50_Weights = _Weights
    models.VGG11_BN_Weights = _Weights
    models.ResNeXt50_32X4D_Weights = _Weights
    # the reference imports the Weights enums from the submodules
    # (classifier/model.py:5-7)
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.ResNet50_Weights = _Weights
    resnet_mod.ResNeXt50_32X4D_Weights = _Weights
    vgg_mod = types.ModuleType("torchvision.models.vgg")
    vgg_mod.VGG11_BN_Weights = _Weights
    models.resnet, models.vgg = resnet_mod, vgg_mod
    tv.models = models
    # nd_vae's NVAE.py does `from torchvision import datasets, transforms`
    # at module top but only uses them in commented-out legacy code
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet_mod
    sys.modules["torchvision.models.vgg"] = vgg_mod
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.transforms"] = tv.transforms


def _alias_hl_autoencoders():
    """StyleGan_Trans imports from the stale 'src.hl_autoencoders' path
    (style_transformer.py:5-6); alias it onto the real directory."""
    import importlib
    real_pkg = "src.mlvgms_autoencoders"
    alias_pkg = "src.hl_autoencoders"
    spec = importlib.util.find_spec(real_pkg)
    if spec is None:
        return
    real = importlib.import_module(real_pkg)
    sys.modules[alias_pkg] = real
    # pre-alias the subpackage path so submodule imports resolve
    for sub in ("StyleGan_Trans", "StyleGan_Trans.models",
                "StyleGan_Trans.models.encoders"):
        try:
            m = importlib.import_module(f"{real_pkg}.{sub}")
            sys.modules[f"{alias_pkg}.{sub}"] = m
        except Exception:
            pass


def load_reference_defenses():
    """Import src.defenses.ours.models, shimming the reference's broken
    `Union` annotation (abstract_models.py:162 uses typing.Union without
    importing it - a documented upstream bug, SURVEY.md 7) by providing it
    as a builtin for the duration of the import."""
    import builtins
    import importlib
    import typing

    load_reference()
    had = hasattr(builtins, "Union")
    builtins.Union = typing.Union
    try:
        return importlib.import_module("src.defenses.ours.models")
    finally:
        if not had:
            del builtins.Union


def load_reference():
    """Prepare sys.path + stubs; returns the reference root path.  Skips the
    calling test when the reference checkout is unavailable."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _stub_kornia()
    _stub_stylegan_ops()
    _stub_torchvision()
    _alias_hl_autoencoders()
    return REFERENCE
