"""Self-hosted LPIPS-style perceptual loss from the golden YOLO backbone.

Real-ESRGAN's recipe is pixel + PERCEPTUAL + GAN (its shipped x4 weights are
trained with a VGG feature loss); the round-4 GAN arm ran without the
perceptual term ("no VGG weights" under zero egress) and its x4 outputs
stayed below the originals on BRISQUE/TOPIQ (VERDICT r4 missing #2). The
blocker is stale: the repo owns a conv feature extractor trained on real
faces — the golden YOLOv11 backbone (eval/assets/yolo11n_golden.npz,
tools/golden_finetune.py). This module turns its multi-scale pyramid
(stem P1/2 -> c3k2_0 P2/4 -> c3k2_1 P3/8 -> c3k2_2 P4/16) into an
LPIPS-style distance: channel-unit-normalized feature differences, mean
square, averaged across layers — the standard deep-feature metric shape
(Zhang et al. 2018), with a face-trained backbone standing in for VGG.

Reference for the loss's role: the x4 weights `utils/enhancer.py:99-129`
loads are trained with exactly such a term (Real-ESRGAN paper, L1+percep+GAN).
"""
from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["make_yolo_feature_loss", "DEFAULT_LAYERS"]

DEFAULT_LAYERS = ("stem", "c3k2_0", "c3k2_1", "c3k2_2")

_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "eval", "assets",
)
GOLDEN_YOLO = os.path.join(_ASSETS, "yolo11n_golden.npz")


def _unit_norm(f: jax.Array, eps: float = 1e-6) -> jax.Array:
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


def make_yolo_feature_loss(
    weights_path: str = GOLDEN_YOLO,
    scale: str = "n",
    layers: Sequence[str] = DEFAULT_LAYERS,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns ``loss(a, b) -> scalar`` for images [B,H,W,3] in [0,1].

    The backbone runs frozen (weights are closure constants; gradients flow
    through activations only), float32, train=False BN. H/W need only be
    divisible by 32 (the standard SR patch sizes 128/192/256 all are)."""
    from facedet_tpu.engine.detector import load_params_npz
    from facedet_tpu.models.yolov11 import Backbone, YoloConfig

    variables = load_params_npz(weights_path)
    cfg = YoloConfig(scale=scale, num_classes=1, with_pose=True, dtype="float32")
    backbone = Backbone(cfg)
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    layer_set = set(layers)

    def features(x: jax.Array) -> list[jax.Array]:
        _, state = backbone.apply(
            bb_vars, x, train=False,
            capture_intermediates=lambda mdl, _m: mdl.name in layer_set,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]
        feats = []
        for name in layers:  # deterministic layer order
            if name in inter:
                feats.append(inter[name]["__call__"][0])
        return feats

    def loss(a: jax.Array, b: jax.Array) -> jax.Array:
        fa = features(a.astype(jnp.float32))
        fb = features(b.astype(jnp.float32))
        terms = [
            jnp.mean(jnp.square(_unit_norm(x) - _unit_norm(y)))
            for x, y in zip(fa, fb)
        ]
        return jnp.mean(jnp.stack(terms))

    return loss
