"""Torch reference implementation of YOLOv11-pose with ultralytics state-dict
naming (``model.0`` .. ``model.23``), used ONLY by tests as the golden-
activation oracle for models/convert.py.

Semantics transcribed from the published ultralytics architecture spec (the
same spec models/yolov11.py implements in flax): Conv = Conv2d(bias=False) +
BatchNorm2d(eps=1e-3) + SiLU; C3k2/C3k/Bottleneck CSP blocks; SPPF; C2PSA
attention; PAN neck; decoupled Detect + Pose head. The reference repo itself
contains no model code (it drives the ultralytics pip package —
utils/yolo_wrapper.py:55); this file exists so converted checkpoints can be
differential-tested against torch forward passes without that package.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


def DWConv(c1, c2, k=3):
    return Conv(c1, c2, k, g=c1)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0])
        self.cv2 = Conv(c_, c2, k[1])
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3k(nn.Module):
    def __init__(self, c1, c2, n=2, shortcut=True, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c1, c_, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, k=(k, k), e=1.0) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k2(nn.Module):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut) if c3k else Bottleneck(self.c, self.c, shortcut)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        self.qkv = Conv(dim, dim + nh_kd * 2, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, g=dim, act=False)

    def forward(self, x):
        b, c, h, w = x.shape
        n = h * w
        qkv = self.qkv(x)
        q, k, v = qkv.view(b, self.num_heads, self.key_dim * 2 + self.head_dim, n).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2
        )
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(b, c, h, w) + self.pe(v.reshape(b, c, h, w))
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4):
        super().__init__()
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(PSABlock(self.c, num_heads=max(1, self.c // 64)) for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        return self.cv2(torch.cat((a, self.m(b)), 1))


class Pose(nn.Module):
    """Decoupled Detect + pose branch (raw per-level maps, no decode)."""

    def __init__(self, ch, nc=1, kpt_shape=(5, 3), reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.nk = kpt_shape[0] * kpt_shape[1]
        c4 = max(ch[0] // 4, self.nk)
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1))
            for x in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )
            for x in ch
        )
        self.cv4 = nn.ModuleList(
            nn.Sequential(Conv(x, c4, 3), Conv(c4, c4, 3), nn.Conv2d(c4, self.nk, 1))
            for x in ch
        )

    def forward(self, feats):
        return [
            (self.cv2[i](f), self.cv3[i](f), self.cv4[i](f)) for i, f in enumerate(feats)
        ]


class TorchYolo11Pose(nn.Module):
    """Full yolo11-pose graph; ``cfg`` is models/yolov11.YoloConfig (for the
    shared channel/depth scaling). State-dict keys are ``model.N.*``."""

    def __init__(self, cfg):
        super().__init__()
        c, d = cfg.ch, cfg.depth
        heavy = cfg.scale in ("m", "l", "x")
        up = nn.Upsample(scale_factor=2, mode="nearest")
        self.model = nn.ModuleList(
            [
                Conv(3, c(64), 3, 2),                                  # 0
                Conv(c(64), c(128), 3, 2),                             # 1
                C3k2(c(128), c(256), d(2), c3k=False, e=0.25),         # 2
                Conv(c(256), c(256), 3, 2),                            # 3
                C3k2(c(256), c(512), d(2), c3k=False, e=0.25),         # 4
                Conv(c(512), c(512), 3, 2),                            # 5
                C3k2(c(512), c(512), d(2), c3k=True),                  # 6
                Conv(c(512), c(1024), 3, 2),                           # 7
                C3k2(c(1024), c(1024), d(2), c3k=True),                # 8
                SPPF(c(1024), c(1024), 5),                             # 9
                C2PSA(c(1024), c(1024), d(2)),                         # 10
                up,                                                    # 11
                nn.Identity(),                                         # 12 Concat
                C3k2(c(1024) + c(512), c(512), d(2), c3k=heavy),       # 13
                up,                                                    # 14
                nn.Identity(),                                         # 15 Concat
                C3k2(c(512) + c(512), c(256), d(2), c3k=heavy),        # 16
                Conv(c(256), c(256), 3, 2),                            # 17
                nn.Identity(),                                         # 18 Concat
                C3k2(c(256) + c(512), c(512), d(2), c3k=heavy),        # 19
                Conv(c(512), c(512), 3, 2),                            # 20
                nn.Identity(),                                         # 21 Concat
                C3k2(c(512) + c(1024), c(1024), d(2), c3k=True),       # 22
                Pose([c(256), c(512), c(1024)], nc=cfg.num_classes,
                     kpt_shape=(cfg.num_keypoints, cfg.kpt_dims)),     # 23
            ]
        )

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[3](m[2](x))
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        p5 = m[10](m[9](m[8](x)))
        x = torch.cat((m[11](p5), p4), 1)
        n4 = m[13](x)
        x = torch.cat((m[14](n4), p3), 1)
        n3 = m[16](x)
        x = torch.cat((m[17](n3), n4), 1)
        m4 = m[19](x)
        x = torch.cat((m[20](m4), p5), 1)
        m5 = m[22](x)
        return m[23]([n3, m4, m5])


def randomize_(module: nn.Module, seed: int = 0) -> nn.Module:
    """Random weights AND non-trivial BN running stats, deterministic."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for mod in module.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) * 1.5 + 0.5)
    return module.eval()
