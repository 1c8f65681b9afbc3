"""SCRFD-style anchor-based face detector (the RetinaFace/SCRFD family the
reference drives through insightface + onnxruntime:
utils/insightface_wrapper.py:38-60, docs sahi/retinaface_sahi.py:19-279;
det_size 640x640, det_thresh, 5 facial keypoints).

Architecture from the published SCRFD design: ResNet-ish backbone with
stride-8/16/32 outputs, PAFPN neck, a shared GroupNorm conv head with three
branches per level — class score (sigmoid), box as ltrb distances in stride
units, and 5 keypoint offsets — with 2 anchors per location. All NHWC flax,
bf16-friendly; decode is a pure function mirroring models/yolo_decode.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from facedet_tpu.models.layers import upsample2x

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2  # anchors per location (same center, duplicated)


@dataclasses.dataclass(frozen=True)
class ScrfdConfig:
    stem: int = 28
    widths: tuple[int, int, int, int] = (28, 56, 88, 128)
    depths: tuple[int, int, int, int] = (3, 4, 2, 3)
    neck: int = 56
    head_depth: int = 2
    head_width: int = 80
    num_keypoints: int = 5
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


# rough parameter-budget variants mirroring published SCRFD scales
SCRFD_VARIANTS = {
    "scrfd_500m": ScrfdConfig(stem=16, widths=(16, 32, 48, 96), depths=(2, 2, 2, 2), neck=32, head_width=48),
    "scrfd_2.5g": ScrfdConfig(),
    "scrfd_10g": ScrfdConfig(stem=56, widths=(56, 88, 136, 200), depths=(3, 5, 3, 3), neck=88, head_width=112),
}


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1, use_bias=False, dtype=dt)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=dt)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride), use_bias=False, dtype=dt)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x + y)


class ScrfdBackbone(nn.Module):
    cfg: ScrfdConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        x = nn.Conv(cfg.stem, (3, 3), (2, 2), padding=1, use_bias=False, dtype=dt, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x)
        outs = []
        for stage, (w, d) in enumerate(zip(cfg.widths, cfg.depths)):
            for i in range(d):
                x = ResBlock(w, stride=2 if i == 0 else 1, dtype=dt, name=f"s{stage}_b{i}")(x, train)
            if stage >= 1:  # strides 8, 16, 32
                outs.append(x)
        return outs


class Pafpn(nn.Module):
    cfg: ScrfdConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        c = cfg.neck
        lat = [
            nn.Conv(c, (1, 1), dtype=dt, name=f"lat{i}")(f) for i, f in enumerate(feats)
        ]
        # top-down (nearest 2x upsample as broadcast+reshape — MXU/XLA-friendly
        # and ONNX-exportable, vs jax.image.resize's gather lowering; crop
        # covers odd feature sizes from non-power-of-two inputs)
        p = [None] * 3
        p[2] = lat[2]
        for i in (1, 0):
            up = upsample2x(p[i + 1])[:, : lat[i].shape[1], : lat[i].shape[2], :]
            p[i] = lat[i] + up
        p = [
            nn.Conv(c, (3, 3), padding=1, dtype=dt, name=f"smooth{i}")(pi)
            for i, pi in enumerate(p)
        ]
        # bottom-up augmentation
        n = [None] * 3
        n[0] = p[0]
        for i in (1, 2):
            down = nn.Conv(c, (3, 3), (2, 2), padding=1, dtype=dt, name=f"down{i}")(n[i - 1])
            n[i] = p[i] + down
        return n


class ScrfdHead(nn.Module):
    cfg: ScrfdConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        outs = []
        for i, f in enumerate(feats):
            x = f
            for d in range(cfg.head_depth):
                x = nn.Conv(cfg.head_width, (3, 3), padding=1, dtype=dt, name=f"l{i}_conv{d}")(x)
                x = nn.GroupNorm(num_groups=16, dtype=jnp.float32, name=f"l{i}_gn{d}")(x)
                x = nn.relu(x)
            cls = nn.Conv(NUM_ANCHORS, (1, 1), dtype=dt, name=f"l{i}_cls")(x)
            box = nn.Conv(NUM_ANCHORS * 4, (1, 1), dtype=dt, name=f"l{i}_box")(x)
            kps = nn.Conv(NUM_ANCHORS * cfg.num_keypoints * 2, (1, 1), dtype=dt, name=f"l{i}_kps")(x)
            outs.append(
                {
                    "cls": cls.astype(jnp.float32),
                    "box": box.astype(jnp.float32),
                    "kps": kps.astype(jnp.float32),
                }
            )
        return outs


class Scrfd(nn.Module):
    """images [B,H,W,3] in [0,1] -> per-level raw maps."""

    cfg: ScrfdConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.cfg.compute_dtype)
        # insightface normalization: (pix*255 - 127.5) / 128
        x = (x * 255.0 - 127.5) / 128.0
        feats = ScrfdBackbone(self.cfg, name="backbone")(x, train)
        feats = Pafpn(self.cfg, name="neck")(feats, train)
        return ScrfdHead(self.cfg, name="head")(feats, train)


def decode_scrfd(level_outputs: list[dict], num_keypoints: int = 5) -> dict:
    """Raw maps -> flat {boxes [B,A,4] xyxy px, scores [B,A,1], kpts [B,A,K,3]}.

    distance2bbox: anchor centers at (x, y) * stride; box = center -/+ ltrb *
    stride; keypoints = center + offset * stride (SCRFD convention)."""
    boxes, scores, kpts = [], [], []
    for lvl, stride in zip(level_outputs, STRIDES):
        b, h, w, _ = lvl["cls"].shape
        ys = jnp.arange(h, dtype=jnp.float32) * stride
        xs = jnp.arange(w, dtype=jnp.float32) * stride
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        centers = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # [hw, 2]
        centers = jnp.repeat(centers, NUM_ANCHORS, axis=0)  # [hw*A, 2]

        cls = jax.nn.sigmoid(lvl["cls"].reshape(b, -1, 1))
        dist = lvl["box"].reshape(b, -1, 4) * stride
        x1y1 = centers[None] - dist[..., :2]
        x2y2 = centers[None] + dist[..., 2:]
        boxes.append(jnp.concatenate([x1y1, x2y2], -1))
        scores.append(cls)

        kp = lvl["kps"].reshape(b, -1, num_keypoints, 2) * stride
        kxy = centers[None, :, None, :] + kp
        kv = jnp.broadcast_to(cls[..., None, 0:1], kxy.shape[:-1] + (1,))
        kpts.append(jnp.concatenate([kxy, kv], -1))
    return {
        "boxes": jnp.concatenate(boxes, 1),
        "scores": jnp.concatenate(scores, 1),
        "kpts": jnp.concatenate(kpts, 1),
    }


def decode_scrfd_flat(outs: tuple, input_hw: tuple[int, int]) -> dict:
    """Decode the flattened per-level outputs of an insightface SCRFD ONNX
    graph into {boxes [B,A,4] xyxy px, scores [B,A,1], kpts [B,A,K,3]}.

    The pretrained graphs (loaded via models/onnx_import; the reference runs
    them through onnxruntime — utils/insightface_wrapper.py:38-44) emit, in
    output order: score_8, score_16, score_32, bbox_8.., kps_8.. — each level
    already sigmoided/flattened to [B, h*w*A, c] with bbox/kps in stride
    units (insightface model_zoo/scrfd.py forward convention, anchor-fastest
    flattening). 6 outputs = no keypoint branch."""
    n_lv = len(STRIDES)
    if len(outs) not in (2 * n_lv, 3 * n_lv):
        raise ValueError(
            f"expected {2 * n_lv} or {3 * n_lv} outputs (scores/bbox[/kps] per "
            f"stride), got {len(outs)}"
        )
    has_kps = len(outs) == 3 * n_lv
    h, w = input_hw
    b = outs[0].shape[0]
    boxes, scores, kpts = [], [], []
    for i, stride in enumerate(STRIDES):
        cls = outs[i].reshape(b, -1, 1)
        dist = outs[i + n_lv].reshape(b, -1, 4) * stride
        fh, fw = -(-h // stride), -(-w // stride)
        na = cls.shape[1] // (fh * fw)
        ys = jnp.arange(fh, dtype=jnp.float32) * stride
        xs = jnp.arange(fw, dtype=jnp.float32) * stride
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        centers = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)
        centers = jnp.repeat(centers, na, axis=0)  # anchor-fastest

        x1y1 = centers[None] - dist[..., :2]
        x2y2 = centers[None] + dist[..., 2:]
        boxes.append(jnp.concatenate([x1y1, x2y2], -1))
        scores.append(cls)
        if has_kps:
            kp_flat = outs[i + 2 * n_lv].reshape(b, cls.shape[1], -1)
            nk = kp_flat.shape[-1] // 2
            kp = kp_flat.reshape(b, -1, nk, 2) * stride
            kxy = centers[None, :, None, :] + kp
        else:
            nk = 5
            kxy = jnp.zeros((b, cls.shape[1], nk, 2), jnp.float32)
        kv = jnp.broadcast_to(cls[..., None, 0:1], kxy.shape[:-1] + (1,))
        kpts.append(jnp.concatenate([kxy, kv], -1))
    return {
        "boxes": jnp.concatenate(boxes, 1),
        "scores": jnp.concatenate(scores, 1),
        "kpts": jnp.concatenate(kpts, 1),
    }


def create_scrfd(cfg: ScrfdConfig, rng: jax.Array, image_size: int = 640):
    model = Scrfd(cfg)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
    return model, variables
