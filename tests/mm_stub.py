"""Minimal mmcv / mmengine / mmdet stubs + loaders for the reference's
legacy text-guided necks (VERDICT r2 item 5).

The reference bricks (wedetect/models/layers/yolo_bricks.py) and necks
(wedetect/models/necks/*.py) import mmcv/mmdet/mmengine, which are not
installed here.  Their actual *numerical* dependency surface is tiny:

- ``mmcv.cnn.ConvModule``       — Conv2d (+ optional BN + activation),
  order conv→norm→act, conv bias off when a norm is configured
- ``mmcv.cnn.Linear``           — nn.Linear
- ``mmengine.model.BaseModule`` — nn.Module with an ``init_cfg`` kwarg
- ``mmdet.registry.MODELS``     — register/build by class name
- ``mmdet.models.layers.csp_layer.DarknetBottleneck`` and
  ``mmdet.models.backbones.csp_darknet.CSPLayer`` — standard darknet
  bricks (re-derived from their documented structure)

This module provides exactly those so the reference modules can be
instantiated and used as numerical oracles.  It is test-only code.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import torch
import torch.nn as nn

from conftest import REFERENCE_DIR

_ACTS = {
    "relu": nn.ReLU,
    "silu": nn.SiLU,
    "swish": nn.SiLU,
    "hardswish": nn.Hardswish,
    "leakyrelu": nn.LeakyReLU,
}


def _build_act(act_cfg):
    if act_cfg is None:
        return None
    return _ACTS[act_cfg["type"].lower()]()


class ConvModule(nn.Module):
    """mmcv ConvModule, restricted to the ('conv','norm','act') order and
    BN norms the reference bricks use.  Child names (conv/bn/activate)
    match mmcv so state-dict keys line up with the real thing."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto",
                 conv_cfg=None, norm_cfg=None, act_cfg=dict(type="ReLU"),
                 inplace=True, order=("conv", "norm", "act")):
        super().__init__()
        assert conv_cfg is None
        assert tuple(order) == ("conv", "norm", "act")
        with_norm = norm_cfg is not None
        if bias == "auto":
            bias = not with_norm
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=bias)
        if with_norm:
            assert norm_cfg["type"] == "BN", norm_cfg
            self.bn = nn.BatchNorm2d(out_channels,
                                     eps=norm_cfg.get("eps", 1e-5),
                                     momentum=norm_cfg.get("momentum", 0.1))
        else:
            self.bn = None
        self.activate = _build_act(act_cfg)

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        if self.activate is not None:
            x = self.activate(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, norm_cfg=None,
                 act_cfg=dict(type="ReLU"), **kwargs):
        super().__init__()
        self.depthwise_conv = ConvModule(
            in_channels, in_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=in_channels,
            norm_cfg=norm_cfg, act_cfg=act_cfg)
        self.pointwise_conv = ConvModule(
            in_channels, out_channels, 1, norm_cfg=norm_cfg,
            act_cfg=act_cfg)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):
        pass


class _Registry:
    def __init__(self):
        self._modules = {}

    def register_module(self, *args, **kwargs):
        def deco(cls):
            self._modules[cls.__name__] = cls
            return cls
        return deco

    def build(self, cfg):
        cfg = dict(cfg)
        return self._modules[cfg.pop("type")](**cfg)


class MMDetDarknetBottleneck(BaseModule):
    """mmdet DarknetBottleneck base: 1x1 conv -> 3x3 conv (+identity).
    The reference subclass overrides conv1/conv2 after super().__init__,
    so only the ctor signature, add_identity default, and forward matter
    here (it still builds the default convs for standalone use by the
    stub CSPLayer below)."""

    def __init__(self, in_channels, out_channels, expansion=0.5,
                 add_identity=True, use_depthwise=False, conv_cfg=None,
                 norm_cfg=dict(type="BN", momentum=0.03, eps=0.001),
                 act_cfg=dict(type="Swish"), init_cfg=None):
        super().__init__(init_cfg=init_cfg)
        hidden_channels = int(out_channels * expansion)
        conv = (DepthwiseSeparableConvModule if use_depthwise
                else ConvModule)
        self.conv1 = ConvModule(in_channels, hidden_channels, 1,
                                norm_cfg=norm_cfg, act_cfg=act_cfg)
        self.conv2 = conv(hidden_channels, out_channels, 3, stride=1,
                          padding=1, norm_cfg=norm_cfg, act_cfg=act_cfg)
        self.add_identity = add_identity and in_channels == out_channels

    def forward(self, x):
        identity = x
        out = self.conv2(self.conv1(x))
        return out + identity if self.add_identity else out


class CSPLayer(BaseModule):
    """mmdet CSPLayer (C3): main/short 1x1 to mid channels, N darknet
    bottlenecks on main, concat(main, short), final 1x1."""

    def __init__(self, in_channels, out_channels, expand_ratio=0.5,
                 num_blocks=1, add_identity=True, use_depthwise=False,
                 use_cspnext_block=False, channel_attention=False,
                 conv_cfg=None,
                 norm_cfg=dict(type="BN", momentum=0.03, eps=0.001),
                 act_cfg=dict(type="Swish"), init_cfg=None):
        super().__init__(init_cfg=init_cfg)
        assert not (use_cspnext_block or channel_attention)
        mid_channels = int(out_channels * expand_ratio)
        self.main_conv = ConvModule(in_channels, mid_channels, 1,
                                    norm_cfg=norm_cfg, act_cfg=act_cfg)
        self.short_conv = ConvModule(in_channels, mid_channels, 1,
                                     norm_cfg=norm_cfg, act_cfg=act_cfg)
        self.final_conv = ConvModule(2 * mid_channels, out_channels, 1,
                                     norm_cfg=norm_cfg, act_cfg=act_cfg)
        self.blocks = nn.Sequential(*[
            MMDetDarknetBottleneck(
                mid_channels, mid_channels, 1.0,
                add_identity=add_identity, use_depthwise=use_depthwise,
                norm_cfg=norm_cfg, act_cfg=act_cfg)
            for _ in range(num_blocks)])

    def forward(self, x):
        x_short = self.short_conv(x)
        x_main = self.blocks(self.main_conv(x))
        return self.final_conv(torch.cat((x_main, x_short), dim=1))


def install_mm_stubs():
    """Install stub mmcv/mmengine/mmdet packages into sys.modules.

    Idempotent; safe alongside the lighter stub in test_assigner.py
    (supersedes it — provides everything that one provides too)."""
    if getattr(sys.modules.get("mmdet"), "_wedetect_tpu_stub", False):
        return

    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.DepthwiseSeparableConvModule = DepthwiseSeparableConvModule
    mmcv_cnn.Linear = nn.Linear
    mmcv.cnn = mmcv_cnn

    mmengine = types.ModuleType("mmengine")
    mmengine_model = types.ModuleType("mmengine.model")
    mmengine_model.BaseModule = BaseModule
    mmengine.model = mmengine_model

    mmdet = types.ModuleType("mmdet")
    mmdet._wedetect_tpu_stub = True
    registry = types.ModuleType("mmdet.registry")
    registry.MODELS = _Registry()
    registry.TASK_UTILS = _Registry()
    registry.DATASETS = _Registry()
    registry.TRANSFORMS = _Registry()
    utils = types.ModuleType("mmdet.utils")
    utils.ConfigType = dict
    utils.OptConfigType = dict
    utils.OptMultiConfig = dict
    structures = types.ModuleType("mmdet.structures")
    bbox = types.ModuleType("mmdet.structures.bbox")
    bbox.HorizontalBoxes = object
    structures.bbox = bbox
    models = types.ModuleType("mmdet.models")
    layers = types.ModuleType("mmdet.models.layers")
    csp_layer = types.ModuleType("mmdet.models.layers.csp_layer")
    csp_layer.DarknetBottleneck = MMDetDarknetBottleneck
    csp_layer.CSPLayer = CSPLayer
    backbones = types.ModuleType("mmdet.models.backbones")
    csp_darknet = types.ModuleType("mmdet.models.backbones.csp_darknet")
    csp_darknet.CSPLayer = CSPLayer
    layers.csp_layer = csp_layer
    backbones.csp_darknet = csp_darknet
    models.layers = layers
    models.backbones = backbones
    mmdet.registry = registry
    mmdet.utils = utils
    mmdet.structures = structures
    mmdet.models = models

    sys.modules.update({
        "mmcv": mmcv, "mmcv.cnn": mmcv_cnn,
        "mmengine": mmengine, "mmengine.model": mmengine_model,
        "mmdet": mmdet, "mmdet.registry": registry,
        "mmdet.utils": utils,
        "mmdet.structures": structures,
        "mmdet.structures.bbox": bbox,
        "mmdet.models": models,
        "mmdet.models.layers": layers,
        "mmdet.models.layers.csp_layer": csp_layer,
        "mmdet.models.backbones": backbones,
        "mmdet.models.backbones.csp_darknet": csp_darknet,
    })


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_necks():
    """Import the reference yolo_bricks + neck modules under the stubs.

    Returns a namespace with: bricks (yolo_bricks module), base, v5, v8,
    world (the neck modules)."""
    install_mm_stubs()
    if "_refm.necks.yolo_world_pafpn" in sys.modules:
        ns = types.SimpleNamespace()
        ns.bricks = sys.modules["_refm.layers.yolo_bricks"]
        ns.base = sys.modules["_refm.necks.base_yolo_neck"]
        ns.v5 = sys.modules["_refm.necks.yolov5_pafpn"]
        ns.v8 = sys.modules["_refm.necks.yolov8_pafpn"]
        ns.world = sys.modules["_refm.necks.yolo_world_pafpn"]
        return ns

    models_dir = os.path.join(REFERENCE_DIR, "wedetect", "models")
    pkg = types.ModuleType("_refm")
    pkg.__path__ = [models_dir]
    sys.modules["_refm"] = pkg
    for sub in ("layers", "necks"):
        p = types.ModuleType(f"_refm.{sub}")
        p.__path__ = [os.path.join(models_dir, sub)]
        sys.modules[f"_refm.{sub}"] = p

    bricks = _load("_refm.layers.yolo_bricks",
                   os.path.join(models_dir, "layers", "yolo_bricks.py"))
    # `from .. import CSPLayerWithTwoConv` in yolov8_pafpn resolves to
    # the _refm package: expose the brick there.
    pkg.CSPLayerWithTwoConv = bricks.CSPLayerWithTwoConv
    # the plain CSP brick carries no @MODELS.register_module decorator
    sys.modules["mmdet.registry"].MODELS._modules.setdefault(
        "CSPLayerWithTwoConv", bricks.CSPLayerWithTwoConv)

    ns = types.SimpleNamespace()
    ns.bricks = bricks
    necks_dir = os.path.join(models_dir, "necks")
    ns.base = _load("_refm.necks.base_yolo_neck",
                    os.path.join(necks_dir, "base_yolo_neck.py"))
    ns.v5 = _load("_refm.necks.yolov5_pafpn",
                  os.path.join(necks_dir, "yolov5_pafpn.py"))
    ns.v8 = _load("_refm.necks.yolov8_pafpn",
                  os.path.join(necks_dir, "yolov8_pafpn.py"))
    ns.world = _load("_refm.necks.yolo_world_pafpn",
                     os.path.join(necks_dir, "yolo_world_pafpn.py"))
    return ns
