"""Pure-torch twins of the reference model classes, with the reference's
exact state-dict key vocabulary, at miniature widths.

These exist so the name-mapped checkpoint importer
(e_osvos_tpu/models/torch_import.py) can be verified end to end: build the
twin → randomize → export state_dict (keys identical to what the reference
saves) → import into flax → require the forwards to match numerically.

Twin structure follows the reference classes:
  - resnet trunk: torchvision Bottleneck/_make_layer semantics incl.
    replace_stride_with_dilation (first block of a dilated stage keeps the
    previous dilation) — /root/reference/src/networks/deeplabv3plus.py:113-118
  - ASPP/DeepLabHead: torchvision deeplabv3 module layout
    (convs.0 1x1 / convs.1-3 dilated / convs.4 pooling / project) wrapped as
    classifier.0 — deeplabv3plus.py:15-20
  - V3+ Decoder: conv1/bn1 + last_conv Sequential —
    deeplabv3plus.py:56-101 (align_corners=True internal upsample at :91)
  - Mask R-CNN FPN/heads: torchvision detection key names the reference
    checkpoints carry — mask_rcnn.py:425-465
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

EPS = 1e-6  # matches FusedGroupNorm's flax-default epsilon


def gn(groups, ch, eps=EPS):
    return nn.GroupNorm(groups, ch, eps=eps)


class Bottleneck(nn.Module):
    """torchvision Bottleneck with pluggable norm factory."""

    def __init__(self, in_ch, filters, stride=1, dilation=1, norm=None):
        super().__init__()
        norm = norm or (lambda c: gn(4, c))
        out_ch = filters * 4
        self.conv1 = nn.Conv2d(in_ch, filters, 1, bias=False)
        self.bn1 = norm(filters)
        self.conv2 = nn.Conv2d(filters, filters, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = norm(filters)
        self.conv3 = nn.Conv2d(filters, out_ch, 1, bias=False)
        self.bn3 = norm(out_ch)
        self.downsample = None
        if in_ch != out_ch or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                norm(out_ch),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class ResnetTrunk(nn.Module):
    """ResNet trunk with torchvision naming (conv1/bn1/layer1..4) and
    torchvision replace_stride_with_dilation/_make_layer semantics.
    Defaults to the miniature resnet10 shape (1 block/stage, widths
    8/16/32/64); pass ``widths=(64,128,256,512), blocks=(3,4,6,3),
    stem=64`` for the real resnet50 shape (full-width import parity,
    reference deeplabv3plus.py:113-118 / mask_rcnn.py:431)."""

    def __init__(self, dilate=(False, False, False), norm=None,
                 widths=(8, 16, 32, 64), blocks=(1, 1, 1, 1), stem=8):
        super().__init__()
        norm = norm or (lambda c: gn(4, c))
        self.conv1 = nn.Conv2d(3, stem, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm(stem)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        dilation = 1
        in_ch = stem
        for i, (filters, n_blocks) in enumerate(zip(widths, blocks)):
            stride = 1 if i == 0 else 2
            prev_dilation = dilation
            if i > 0 and dilate[i - 1]:
                dilation *= 2
                stride = 1
            stage = [Bottleneck(in_ch, filters, stride=stride,
                                dilation=prev_dilation if i > 0 else 1,
                                norm=norm)]
            # torchvision _make_layer: blocks after the first use the
            # stage's (updated) dilation, stride 1, no downsample
            stage += [
                Bottleneck(filters * 4, filters, stride=1,
                           dilation=dilation if i > 0 else 1, norm=norm)
                for _ in range(n_blocks - 1)
            ]
            setattr(self, f"layer{i + 1}", nn.Sequential(*stage))
            in_ch = filters * 4

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        feats = []
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            feats.append(x)
        return feats  # C2..C5


class ASPP(nn.Module):
    """torchvision ASPP twin (the reference's classifier.0)."""

    def __init__(self, in_ch, out_ch=256, rates=(6, 12, 18), norm=None):
        super().__init__()
        norm = norm or (lambda c: gn(4, c))
        convs = [nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                               norm(out_ch), nn.ReLU())]
        for r in rates:
            convs.append(nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 3, padding=r, dilation=r, bias=False),
                norm(out_ch), nn.ReLU()))
        convs.append(nn.Sequential(
            nn.AdaptiveAvgPool2d(1),
            nn.Conv2d(in_ch, out_ch, 1, bias=False),
            norm(out_ch), nn.ReLU()))
        self.convs = nn.ModuleList(convs)
        self.project = nn.Sequential(
            nn.Conv2d(5 * out_ch, out_ch, 1, bias=False),
            norm(out_ch), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        res = [c(x) for c in self.convs[:-1]]
        pooled = self.convs[-1](x)
        res.append(pooled.expand(-1, -1, x.shape[2], x.shape[3]))
        return self.project(torch.cat(res, dim=1))


class Decoder(nn.Module):
    """Reference V3+ Decoder twin (deeplabv3plus.py:56-101)."""

    def __init__(self, low_ch, num_classes, norm=None):
        super().__init__()
        norm = norm or (lambda c: gn(4, c))
        self.conv1 = nn.Conv2d(low_ch, 48, 1, bias=False)
        self.bn1 = norm(48)
        self.relu = nn.ReLU()
        self.last_conv = nn.Sequential(
            nn.Conv2d(304, 256, 3, padding=1, bias=False),
            norm(256), nn.ReLU(), nn.Dropout(0.5),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            norm(256), nn.ReLU(), nn.Dropout(0.1),
            nn.Conv2d(256, num_classes, 1))

    def forward(self, x, low):
        low = self.relu(self.bn1(self.conv1(low)))
        x = F.interpolate(x, size=low.shape[2:], mode="bilinear",
                          align_corners=True)
        return self.last_conv(torch.cat((x, low), dim=1))


_TRUNKS = {
    # arch -> (widths, blocks, stem)
    "resnet10": ((8, 16, 32, 64), (1, 1, 1, 1), 8),
    "resnet50": ((64, 128, 256, 512), (3, 4, 6, 3), 64),
}


def make_trunk(arch, dilate, norm):
    widths, blocks, stem = _TRUNKS[arch]
    return ResnetTrunk(dilate=dilate, norm=norm, widths=widths,
                       blocks=blocks, stem=stem)


class DeepLabV3Plus(nn.Module):
    """Reference DeepLabV3Plus twin; state-dict keys identical to the
    reference class (backbone./classifier.0./decoder.*). arch='resnet50'
    gives the real widths (ASPP in 2048, decoder low-level 256)."""

    def __init__(self, num_classes=1, output_stride=8, norm=None,
                 arch="resnet10"):
        super().__init__()
        dilate = {8: (False, True, True), 16: (False, False, True)}[output_stride]
        self.backbone = make_trunk(arch, dilate, norm)
        top_ch = _TRUNKS[arch][0][3] * 4
        self.classifier = nn.Sequential(ASPP(top_ch, norm=norm))
        self.decoder = Decoder(low_ch=_TRUNKS[arch][0][0] * 4,
                               num_classes=num_classes, norm=norm)

    def forward(self, x):
        size = x.shape[2:]
        feats = self.backbone(x)
        y = self.classifier(feats[3])
        y = self.decoder(y, feats[0])
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)


class DeepLabV3(nn.Module):
    """Reference DeepLabV3 twin: torchvision DeepLabHead = Sequential(ASPP,
    3x3 conv, norm, ReLU, final 1x1) (deeplabv3.py:24-42)."""

    def __init__(self, num_classes=1, output_stride=8, norm=None,
                 arch="resnet10"):
        super().__init__()
        norm = norm or (lambda c: gn(4, c))
        dilate = {8: (False, True, True), 16: (False, False, True)}[output_stride]
        self.backbone = make_trunk(arch, dilate, norm)
        self.classifier = nn.Sequential(
            ASPP(_TRUNKS[arch][0][3] * 4, norm=norm),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            norm(256), nn.ReLU(),
            nn.Conv2d(256, num_classes, 1))

    def forward(self, x):
        size = x.shape[2:]
        y = self.classifier(self.backbone(x)[3])
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)


class FPN(nn.Module):
    """torchvision FPN twin (inner/layer block key names)."""

    def __init__(self, in_chs=(32, 64, 128, 256), out_ch=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out_ch, 1) for c in in_chs])
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out_ch, out_ch, 3, padding=1) for _ in in_chs])

    def forward(self, feats):
        laterals = [b(f) for b, f in zip(self.inner_blocks, feats)]
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = F.interpolate(ps[0], size=lat.shape[2:], mode="nearest")
            ps.insert(0, lat + up)
        outs = [b(p) for b, p in zip(self.layer_blocks, ps)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs  # P2..P6


class RPNHead(nn.Module):
    def __init__(self, out_ch=256, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.cls_logits = nn.Conv2d(out_ch, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(out_ch, num_anchors * 4, 1)

    def forward(self, f):
        t = torch.relu(self.conv(f))
        return self.cls_logits(t), self.bbox_pred(t)


class BoxHeadAndPredictor(nn.Module):
    """torchvision TwoMLPHead + FastRCNNPredictor twin, packaged so the
    state-dict carries both roi_heads.box_head.* and
    roi_heads.box_predictor.* key groups."""

    def __init__(self, pooled=(7, 7), ch=256, num_classes=2):
        super().__init__()
        in_dim = ch * pooled[0] * pooled[1]
        self.box_head = nn.ModuleDict({
            "fc6": nn.Linear(in_dim, 1024),
            "fc7": nn.Linear(1024, 1024),
        })
        self.box_predictor = nn.ModuleDict({
            "cls_score": nn.Linear(1024, num_classes),
            "bbox_pred": nn.Linear(1024, num_classes * 4),
        })

    def forward(self, x):  # x: [N, C, H, W] pooled ROI features
        x = x.flatten(1)
        x = torch.relu(self.box_head["fc6"](x))
        x = torch.relu(self.box_head["fc7"](x))
        return (self.box_predictor["cls_score"](x),
                self.box_predictor["bbox_pred"](x))


class MaskHeadAndPredictor(nn.Module):
    """torchvision MaskRCNNHeads + MaskRCNNPredictor twin."""

    def __init__(self, ch=256, num_classes=2):
        super().__init__()
        self.mask_head = nn.ModuleDict({
            f"mask_fcn{i}": nn.Conv2d(ch, ch, 3, padding=1)
            for i in range(1, 5)
        })
        self.mask_predictor = nn.ModuleDict({
            "conv5_mask": nn.ConvTranspose2d(ch, ch, 2, stride=2),
            "mask_fcn_logits": nn.Conv2d(ch, num_classes, 1),
        })

    def forward(self, x):  # [N, C, 14, 14]
        for i in range(1, 5):
            x = torch.relu(self.mask_head[f"mask_fcn{i}"](x))
        x = torch.relu(self.mask_predictor["conv5_mask"](x))
        return self.mask_predictor["mask_fcn_logits"](x)


class MaskRCNN(nn.Module):
    """Key-vocabulary twin of the reference detector: the state dict has
    exactly the torchvision maskrcnn key groups (backbone.body.*,
    backbone.fpn.*, rpn.head.*, roi_heads.*)."""

    def __init__(self, num_classes=2, norm=None, arch="resnet10"):
        super().__init__()
        widths = _TRUNKS[arch][0]
        self.backbone = nn.ModuleDict({
            "body": make_trunk(arch, (False, False, False), norm),
            "fpn": FPN(in_chs=tuple(w * 4 for w in widths)),
        })
        self.rpn = nn.ModuleDict({"head": RPNHead()})
        roi = nn.ModuleDict()
        box = BoxHeadAndPredictor(num_classes=num_classes)
        mask = MaskHeadAndPredictor(num_classes=num_classes)
        roi["box_head"] = box.box_head
        roi["box_predictor"] = box.box_predictor
        roi["mask_head"] = mask.mask_head
        roi["mask_predictor"] = mask.mask_predictor
        self.roi_heads = roi

    def pyramid(self, x):
        return self.backbone["fpn"](self.backbone["body"](x))

    def box_forward(self, pooled):
        x = pooled.flatten(1)
        x = torch.relu(self.roi_heads["box_head"]["fc6"](x))
        x = torch.relu(self.roi_heads["box_head"]["fc7"](x))
        return (self.roi_heads["box_predictor"]["cls_score"](x),
                self.roi_heads["box_predictor"]["bbox_pred"](x))

    def mask_forward(self, x):
        for i in range(1, 5):
            x = torch.relu(self.roi_heads["mask_head"][f"mask_fcn{i}"](x))
        x = torch.relu(self.roi_heads["mask_predictor"]["conv5_mask"](x))
        return self.roi_heads["mask_predictor"]["mask_fcn_logits"](x)


def randomize(module: nn.Module, seed: int = 0) -> None:
    """Fill every parameter with seeded noise so parity can't pass via
    default-initialized weights. Weights use fan-in scaling and norm scales
    sit near 1 so activations keep O(1) magnitude through the full depth —
    otherwise outputs underflow and any import error hides inside atol."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.ndim >= 2:  # conv / linear weight
                fan_in = p.shape[1] * (p.shape[2] * p.shape[3] if p.ndim == 4
                                       else 1)
                p.copy_(torch.randn(p.shape, generator=gen)
                        * (2.0 / fan_in) ** 0.5)
            elif name.endswith("weight"):  # norm scale
                p.copy_(1.0 + 0.2 * torch.randn(p.shape, generator=gen))
            else:  # biases
                p.copy_(0.1 * torch.randn(p.shape, generator=gen))
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=gen) + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=gen) * 0.1)
