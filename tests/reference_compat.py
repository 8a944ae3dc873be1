"""Import helpers for the PyTorch reference (used only for parity tests).

The reference package depends on torchvision/iopath which are absent from
this image; install minimal stubs so its pure-torch model code imports.
Tests that use this module are parity checks only — the framework itself
never imports the reference.
"""

from __future__ import annotations

import sys
import types

import torch

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "torchvision" in sys.modules:
        return
    import torch
    from torch import nn

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_sd = types.ModuleType("torchvision.ops.stochastic_depth")
    tv_models_video = types.ModuleType("torchvision.models.video")
    tv_swin = types.ModuleType("torchvision.models.video.swin_transformer")

    class _Bottleneck(nn.Module):
        expansion = 4

    class _ResNet(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    tv_resnet.Bottleneck = _Bottleneck
    tv_resnet.ResNet = _ResNet

    class StochasticDepth(nn.Module):
        def __init__(self, p: float, mode: str):
            super().__init__()
            self.p = p
            self.mode = mode

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.empty(shape, device=x.device).bernoulli_(keep)
            return x * mask / keep

    tv_sd.StochasticDepth = StochasticDepth
    tv_ops.StochasticDepth = StochasticDepth
    tv_ops.stochastic_depth = tv_sd

    # torchvision.ops.boxes: the two pure-torch helpers MDETR losses use
    tv_boxes = types.ModuleType("torchvision.ops.boxes")

    def box_convert(boxes, in_fmt, out_fmt):
        assert in_fmt == "cxcywh" and out_fmt == "xyxy"
        cx, cy, w, h = boxes.unbind(-1)
        return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def box_iou(boxes1, boxes2):
        area1, area2 = box_area(boxes1), box_area(boxes2)
        lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        union = area1[:, None] + area2[None, :] - inter
        return inter / union, union

    def generalized_box_iou(boxes1, boxes2):
        iou, union = box_iou(boxes1, boxes2)
        lt = torch.min(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.max(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        area = wh[..., 0] * wh[..., 1]
        return iou - (area - union) / area

    tv_boxes.box_convert = box_convert
    tv_boxes.box_area = box_area
    tv_boxes.box_iou = lambda b1, b2: box_iou(b1, b2)[0]
    tv_boxes.generalized_box_iou = generalized_box_iou
    tv_ops.boxes = tv_boxes

    tv_transforms = types.ModuleType("torchvision.transforms")

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        LANCZOS = "lanczos"

    tv_transforms.InterpolationMode = InterpolationMode
    for _name in [
        "Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
        "RandomResizedCrop", "RandomHorizontalFlip", "Lambda",
    ]:
        setattr(tv_transforms, _name, type(_name, (), {"__init__": lambda self, *a, **k: None}))

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s

    iopath = types.ModuleType("iopath")
    iopath_common = types.ModuleType("iopath.common")
    iopath_fio = types.ModuleType("iopath.common.file_io")

    class PathManager:
        def register_handler(self, *a, **k):
            pass

        def get_local_path(self, path):
            return path

        def open(self, path, *a, **k):
            return open(path, *a, **k)

    class HTTPURLHandler:
        pass

    iopath_fio.PathManager = PathManager
    iopath_fio.HTTPURLHandler = HTTPURLHandler

    for name, mod in [
        ("torchvision", tv),
        ("torchvision.models", tv_models),
        ("torchvision.models.resnet", tv_resnet),
        ("torchvision.models.video", tv_models_video),
        ("torchvision.models.video.swin_transformer", tv_swin),
        ("torchvision.ops", tv_ops),
        ("torchvision.ops.boxes", tv_boxes),
        ("torchvision.ops.stochastic_depth", tv_sd),
        ("torchvision.transforms", tv_transforms),
        ("ftfy", ftfy),
        ("iopath", iopath),
        ("iopath.common", iopath_common),
        ("iopath.common.file_io", iopath_fio),
    ]:
        # a real ModuleSpec so importlib.util.find_spec (e.g. HF datasets'
        # torchvision probe) doesn't choke on __spec__ is None
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    tv.models = tv_models
    tv.ops = tv_ops
    tv_models.resnet = tv_resnet


def import_reference():
    """Returns the torchmultimodal package from /root/reference."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import torchmultimodal

    return torchmultimodal
