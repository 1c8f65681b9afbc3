"""RRDBNet (Real-ESRGAN generator) in flax — the SR network the reference
drives through basicsr/realesrgan (utils/enhancer.py:11-12,99-129: 23-block x4
default, 6-block anime variant, 23-block x2 with pixel-unshuffled input).

TPU-first: NHWC convs (MXU implicit GEMM), bf16 compute / f32 params, and the
x2 variant's pixel-unshuffle is a reshape, not a strided copy. Tiled execution
lives in engine/enhancer.py as a *static* tile batch — one dispatch over all
tiles — instead of the reference's serial tile loop with CUDA-OOM retry
(utils/enhancer.py:216-229).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.2


@dataclasses.dataclass(frozen=True)
class RRDBConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4  # network upscale (2 uses pixel-unshuffle input trick)
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


# Published Real-ESRGAN model catalog (reference utils/enhancer.py:99-129,454)
MODEL_CATALOG: dict[str, RRDBConfig] = {
    "RealESRGAN_x4plus": RRDBConfig(scale=4, num_block=23),
    "RealESRGAN_x4plus_anime_6B": RRDBConfig(scale=4, num_block=6),
    "RealESRGAN_x2plus": RRDBConfig(scale=2, num_block=23),
}


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """[B,H,W,C] -> [B,H/f,W/f,C*f*f] (space-to-depth)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class ResidualDenseBlock(nn.Module):
    num_feat: int
    num_grow_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name=name)
        act = lambda v: nn.leaky_relu(v, LRELU_SLOPE)
        x1 = act(conv(self.num_grow_ch, "conv1")(x))
        x2 = act(conv(self.num_grow_ch, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = act(conv(self.num_grow_ch, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = act(conv(self.num_grow_ch, "conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.num_feat, "conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb1")(x)
        y = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb2")(y)
        y = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb3")(y)
        return x + 0.2 * y


class RRDBNet(nn.Module):
    """images [B,H,W,3] in [0,1] -> [B,H*scale,W*scale,3]."""

    cfg: RRDBConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = x.astype(dt)
        if cfg.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif cfg.scale == 1:
            x = pixel_unshuffle(x, 4)
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, dtype=dt, name=name)
        act = lambda v: nn.leaky_relu(v, LRELU_SLOPE)

        feat = conv(cfg.num_feat, "conv_first")(x)
        body = feat
        for i in range(cfg.num_block):
            body = RRDB(cfg.num_feat, cfg.num_grow_ch, dt, name=f"body{i}")(body)
        feat = feat + conv(cfg.num_feat, "conv_body")(body)

        def up2x(v):
            # nearest-neighbour x2 via image.resize: XLA lowers this without
            # materialising the 6-D broadcast intermediate, whose T(8,128)
            # layout padding cost 2.7x HBM at production tile sizes
            b, h, w, c = v.shape
            return jax.image.resize(v, (b, h * 2, w * 2, c), "nearest")

        feat = act(conv(cfg.num_feat, "conv_up1")(up2x(feat)))
        feat = act(conv(cfg.num_feat, "conv_up2")(up2x(feat)))
        feat = act(conv(cfg.num_feat, "conv_hr")(feat))
        out = conv(cfg.num_out_ch, "conv_last")(feat)
        return out.astype(jnp.float32)


def create_rrdbnet(cfg: RRDBConfig, rng: jax.Array, size: int = 64):
    model = RRDBNet(cfg)
    h = size - size % max(cfg.scale, 2)
    variables = model.init(rng, jnp.zeros((1, h, h, cfg.num_in_ch), jnp.float32))
    return model, variables
