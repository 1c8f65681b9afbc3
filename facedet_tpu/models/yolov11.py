"""YOLOv11(-pose) in flax — the detector family the reference drives through
``ultralytics.YOLO`` (utils/yolo_wrapper.py:47-82; checkpoints yolo11{n,s,m,l}-pose
per ``hasil training.txt:3-12``).

TPU-first design notes:
  * NHWC everywhere; convs hit the MXU as implicit GEMMs, BN+SiLU fuse into
    the conv epilogue under XLA.
  * The network runs over the whole SAHI tile batch in one dispatch — batch is
    the tile axis, so MXU utilisation scales with tile count.
  * Raw head outputs are returned as per-level feature maps; decode (DFL,
    anchors, NMS) lives in models/yolo_decode.py so the forward stays a pure
    static-shape function.

Architecture transcribed from the published YOLOv11 spec (CSP backbone with
C3k2 blocks, SPPF, C2PSA attention, PAN-FPN neck, decoupled DFL detect head,
5-keypoint pose branch) — not from the reference repo, which contains no model
code.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from facedet_tpu.models.layers import (
    C2PSA,
    C3k2,
    ConvBnAct,
    SPPF,
    make_divisible,
    upsample2x,
)

# depth multiple, width multiple, max channels — published YOLOv11 scales
SCALES: dict[str, tuple[float, float, int]] = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

STRIDES = (8, 16, 32)
REG_MAX = 16


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    scale: str = "s"
    num_classes: int = 1  # 'face'
    num_keypoints: int = 5
    kpt_dims: int = 3
    with_pose: bool = True
    dtype: str = "float32"
    # BatchNorm/activation compute dtype; "bfloat16" halves inter-layer
    # activation HBM traffic at inference (BN is a folded affine there)
    bn_dtype: str = "float32"

    def ch(self, c: int) -> int:
        depth, width, max_ch = SCALES[self.scale]
        return make_divisible(min(c, max_ch) * width, 8)

    def depth(self, n: int) -> int:
        d, _, _ = SCALES[self.scale]
        return max(1, round(n * d))

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def bn_compute_dtype(self):
        return jnp.dtype(self.bn_dtype)


class Backbone(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False, from_early: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        bdt = cfg.bn_compute_dtype
        c = cfg.ch
        if not from_early:
            x = ConvBnAct(c(64), 3, 2, dtype=dt, bn_dtype=bdt, name="stem")(x, train)  # P1/2
            x = ConvBnAct(c(128), 3, 2, dtype=dt, bn_dtype=bdt, name="down1")(x, train)  # P2/4
            x = C3k2(
                c(256), cfg.depth(2), c3k=False, expansion=0.25, dtype=dt, bn_dtype=bdt, name="c3k2_0"
            )(x, train)
        x = ConvBnAct(c(256), 3, 2, dtype=dt, bn_dtype=bdt, name="down2")(x, train)  # P3/8
        p3 = C3k2(c(512), cfg.depth(2), c3k=False, expansion=0.25, dtype=dt, bn_dtype=bdt, name="c3k2_1")(
            x, train
        )
        x = ConvBnAct(c(512), 3, 2, dtype=dt, bn_dtype=bdt, name="down3")(p3, train)  # P4/16
        p4 = C3k2(c(512), cfg.depth(2), c3k=True, dtype=dt, bn_dtype=bdt, name="c3k2_2")(x, train)
        x = ConvBnAct(c(1024), 3, 2, dtype=dt, bn_dtype=bdt, name="down4")(p4, train)  # P5/32
        x = C3k2(c(1024), cfg.depth(2), c3k=True, dtype=dt, bn_dtype=bdt, name="c3k2_3")(x, train)
        x = SPPF(c(1024), 5, dtype=dt, bn_dtype=bdt, name="sppf")(x, train)
        p5 = C2PSA(c(1024), cfg.depth(2), dtype=dt, bn_dtype=bdt, name="c2psa")(x, train)
        return p3, p4, p5


class PanNeck(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        bdt = cfg.bn_compute_dtype
        c = cfg.ch
        p3, p4, p5 = feats
        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        n4 = C3k2(c(512), cfg.depth(2), c3k=cfg.scale in ("l", "x", "m"), dtype=dt, bn_dtype=bdt, name="up0")(
            x, train
        )
        x = jnp.concatenate([upsample2x(n4), p3], axis=-1)
        n3 = C3k2(c(256), cfg.depth(2), c3k=cfg.scale in ("l", "x", "m"), dtype=dt, bn_dtype=bdt, name="up1")(
            x, train
        )
        x = ConvBnAct(c(256), 3, 2, dtype=dt, bn_dtype=bdt, name="down0")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        m4 = C3k2(c(512), cfg.depth(2), c3k=cfg.scale in ("l", "x", "m"), dtype=dt, bn_dtype=bdt, name="pan0")(
            x, train
        )
        x = ConvBnAct(c(512), 3, 2, dtype=dt, bn_dtype=bdt, name="down1")(m4, train)
        x = jnp.concatenate([x, p5], axis=-1)
        m5 = C3k2(c(1024), cfg.depth(2), c3k=True, dtype=dt, bn_dtype=bdt, name="pan1")(x, train)
        return n3, m4, m5


class DetectHead(nn.Module):
    """Decoupled anchor-free head: DFL box branch + depthwise-separable cls
    branch, optional pose branch (K keypoints x (x, y, vis))."""

    cfg: YoloConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        bdt = cfg.bn_compute_dtype
        chans = [f.shape[-1] for f in feats]
        c2 = max(16, chans[0] // 4, REG_MAX * 4)
        c3 = max(chans[0], min(cfg.num_classes, 100))
        nk = cfg.num_keypoints * cfg.kpt_dims
        c4 = max(chans[0] // 4, nk)
        outs = []
        for i, f in enumerate(feats):
            box = ConvBnAct(c2, 3, dtype=dt, bn_dtype=bdt, name=f"box{i}_0")(f, train)
            box = ConvBnAct(c2, 3, dtype=dt, bn_dtype=bdt, name=f"box{i}_1")(box, train)
            box = nn.Conv(4 * REG_MAX, (1, 1), dtype=dt, name=f"box{i}_2")(box)

            cls = ConvBnAct(
                f.shape[-1], 3, groups=f.shape[-1], dtype=dt, bn_dtype=bdt, name=f"cls{i}_dw0"
            )(f, train)
            cls = ConvBnAct(c3, 1, dtype=dt, bn_dtype=bdt, name=f"cls{i}_pw0")(cls, train)
            cls = ConvBnAct(c3, 3, groups=c3, dtype=dt, bn_dtype=bdt, name=f"cls{i}_dw1")(cls, train)
            cls = ConvBnAct(c3, 1, dtype=dt, bn_dtype=bdt, name=f"cls{i}_pw1")(cls, train)
            cls = nn.Conv(cfg.num_classes, (1, 1), dtype=dt, name=f"cls{i}_out")(cls)

            level = {"box": box.astype(jnp.float32), "cls": cls.astype(jnp.float32)}
            if cfg.with_pose:
                kpt = ConvBnAct(c4, 3, dtype=dt, bn_dtype=bdt, name=f"kpt{i}_0")(f, train)
                kpt = ConvBnAct(c4, 3, dtype=dt, bn_dtype=bdt, name=f"kpt{i}_1")(kpt, train)
                kpt = nn.Conv(nk, (1, 1), dtype=dt, name=f"kpt{i}_2")(kpt)
                level["kpt"] = kpt.astype(jnp.float32)
            outs.append(level)
        return outs


class YoloV11(nn.Module):
    """Full detector: images [B,H,W,3] in [0,1] -> per-level raw head maps.

    ``from_early=True`` means ``x`` is already the c3k2_0 output (produced by
    the exact space-to-depth fast path, models/yolo_s2d.py) and the backbone
    resumes at ``down2``. Inference-only; init/training use the standard path.
    """

    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False, from_early: bool = False):
        x = x.astype(self.cfg.compute_dtype)
        feats = Backbone(self.cfg, name="backbone")(x, train, from_early=from_early)
        feats = PanNeck(self.cfg, name="neck")(feats, train)
        return DetectHead(self.cfg, name="head")(feats, train)


def create_yolo(cfg: YoloConfig, rng: jax.Array, image_size: int = 640):
    """Initialise model + params. Returns (module, variables)."""
    model = YoloV11(cfg)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables
