"""TOPIQ / CFANet no-reference IQA network, TPU-native.

The reference's IQA table carries a TOPIQ-Face column produced by pyiqa's
``topiq_nr-face`` metric (reference: pipeline_v4_yolo/1_Inference.py:121-150,
``hasil eval niqe.txt:4,15-16``). That model is CFANet — "TOPIQ: A Top-down
Approach from Semantics to Distortions for Image Quality Assessment" (Chen et
al., 2023): a ResNet50 feature pyramid whose *coarsest* (most semantic) scale
guides attention top-down through cross-scale attention blocks, ending in a
score head.

Structure implemented here (NR variant):
  1. ResNet50 backbone (NHWC flax), stage outputs C2..C5
     (channels 256/512/1024/2048 at strides 4/8/16/32).
  2. 1x1 dim-reduction per scale to ``embed_dim`` + per-scale spatial pooling
     onto the coarsest grid (gated pooling in the paper; avg-pool here).
  3. Self-attention over the coarsest tokens, then cross-scale attention
     propagating top-down: queries = next-finer scale, keys/values = the
     attended coarser stream.
  4. Mean-token MLP score head with sigmoid range like pyiqa's NR output.

Weights: ``convert_topiq_torch`` loads a torch ``state_dict`` of the
architecture mirror (tests/torch_topiq_ref.py builds one for golden parity;
an exported pyiqa checkpoint re-keyed to that layout loads the same way).
Without weights, eval/iqa.py keeps its documented BRISQUE-derived proxy.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "TopiqConfig",
    "CFANet",
    "ResNet50",
    "create_topiq",
    "convert_topiq_torch",
    "topiq_score",
]


@dataclasses.dataclass(frozen=True)
class TopiqConfig:
    embed_dim: int = 256
    num_heads: int = 4
    num_attn_blocks: int = 1
    mlp_ratio: float = 4.0
    # resnet50 stage widths/depths
    stage_channels: tuple = (256, 512, 1024, 2048)
    stage_depths: tuple = (3, 4, 6, 3)
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


# ---------------------------------------------------------------------------
# ResNet50 backbone (NHWC)
# ---------------------------------------------------------------------------


class BottleneckRes(nn.Module):
    """ResNet-v1 bottleneck: 1x1 -> 3x3 -> 1x1 with BN + downsample branch."""

    features: int  # output channels (4x the bottleneck width)
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.features // 4
        dt = self.dtype
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name=name
        )
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=dt, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(width, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=dt, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dt, name="conv3")(y)
        y = bn("bn3")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=dt, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + y)


class ResNet50(nn.Module):
    """Torchvision-layout ResNet50 trunk emitting C2..C5 stage features."""

    cfg: TopiqConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=dt,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for s, (ch, depth) in enumerate(zip(cfg.stage_channels, cfg.stage_depths)):
            for b in range(depth):
                stride = 2 if (b == 0 and s > 0) else 1
                x = BottleneckRes(ch, stride, dtype=dt, name=f"layer{s + 1}_{b}")(
                    x, train
                )
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# cross-scale attention head
# ---------------------------------------------------------------------------


class AttnBlock(nn.Module):
    """Pre-norm transformer block; cross-attention when ``kv`` is given."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv=None):
        dt = self.dtype
        kv_in = q if kv is None else kv
        h = nn.LayerNorm(epsilon=1e-5, name="norm_q")(q)
        hk = nn.LayerNorm(epsilon=1e-5, name="norm_kv")(kv_in)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=dt, name="attn"
        )(h, hk)
        x = q + attn
        y = nn.LayerNorm(epsilon=1e-5, name="norm_mlp")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=dt, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=dt, name="fc2")(y)
        return x + y


class CFANet(nn.Module):
    """images [B,H,W,3] in [0,1] -> quality score [B] (sigmoid range)."""

    cfg: TopiqConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        x = x.astype(dt)
        # torchvision normalization (pyiqa feeds imagenet-normalized crops)
        mean = jnp.asarray([0.485, 0.456, 0.406], dt)
        std = jnp.asarray([0.229, 0.224, 0.225], dt)
        x = (x - mean) / std
        feats = ResNet50(cfg, name="backbone")(x, train)

        # 1x1 reduce + pool every scale to the coarsest grid
        gh, gw = feats[-1].shape[1], feats[-1].shape[2]
        tokens = []
        for i, f in enumerate(feats):
            r = nn.Conv(cfg.embed_dim, (1, 1), dtype=dt, name=f"reduce{i}")(f)
            fh = f.shape[1] // gh
            if fh > 1:
                r = nn.avg_pool(r, (fh, fh), (fh, fh))
            # scale embedding distinguishes pyramid levels after pooling
            se = self.param(
                f"scale_embed{i}", nn.initializers.normal(0.02), (cfg.embed_dim,)
            )
            tokens.append(r.reshape(r.shape[0], -1, cfg.embed_dim) + se)

        # top-down propagation: self-attention on the semantic top, then
        # cross-scale attention with progressively finer queries
        stream = tokens[-1]
        for j in range(cfg.num_attn_blocks):
            stream = AttnBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                               dtype=dt, name=f"self{j}")(stream)
        for i in range(len(tokens) - 2, -1, -1):
            stream = AttnBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                               dtype=dt, name=f"cross{i}")(tokens[i], kv=stream)

        pooled = stream.mean(axis=1)
        h = nn.Dense(cfg.embed_dim, dtype=dt, name="head_fc1")(pooled)
        h = nn.gelu(h, approximate=False)
        score = nn.Dense(1, dtype=dt, name="head_fc2")(h)
        return jax.nn.sigmoid(score[..., 0].astype(jnp.float32))


def create_topiq(cfg: TopiqConfig | None = None, rng=None, image_size: int = 224):
    cfg = cfg or TopiqConfig()
    model = CFANet(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, image_size, image_size, 3)), train=False
    )
    return model, variables


# ---------------------------------------------------------------------------
# torch state_dict converter
# ---------------------------------------------------------------------------


def _conv_w(t):
    return jnp.asarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))  # OIHW->HWIO


def convert_topiq_torch(state_dict: dict, cfg: TopiqConfig | None = None) -> dict:
    """Torch ``state_dict`` (tests/torch_topiq_ref.py layout — a faithful
    torch mirror of this architecture) -> flax variables for :class:`CFANet`.

    Keys expected: ``backbone.{stem_conv,stem_bn,layer{s}_{b}.{conv1..}}``,
    ``reduce{i}.{weight,bias}``, ``scale_embed{i}``, ``self{j}.*``/
    ``cross{i}.*`` attention blocks (in_proj/out_proj + fc1/fc2 + norms),
    ``head_fc1/head_fc2``."""
    cfg = cfg or TopiqConfig()
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}

    def bn(dst: dict, dstats: dict, prefix: str):
        dst["scale"] = jnp.asarray(sd[f"{prefix}.weight"])
        dst["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        dstats["mean"] = jnp.asarray(sd[f"{prefix}.running_mean"])
        dstats["var"] = jnp.asarray(sd[f"{prefix}.running_var"])

    bb_p, bb_s = {}, {}
    bb_p["stem_conv"] = {"kernel": _conv_w(sd["backbone.stem_conv.weight"])}
    bb_p["stem_bn"], bb_s["stem_bn"] = {}, {}
    bn(bb_p["stem_bn"], bb_s["stem_bn"], "backbone.stem_bn")
    for s, depth in enumerate(cfg.stage_depths):
        for b in range(depth):
            name = f"layer{s + 1}_{b}"
            blk_p, blk_s = {}, {}
            for cv in ("conv1", "conv2", "conv3"):
                blk_p[cv] = {"kernel": _conv_w(sd[f"backbone.{name}.{cv}.weight"])}
            for bnn in ("bn1", "bn2", "bn3"):
                blk_p[bnn], blk_s[bnn] = {}, {}
                bn(blk_p[bnn], blk_s[bnn], f"backbone.{name}.{bnn}")
            if f"backbone.{name}.down_conv.weight" in sd:
                blk_p["down_conv"] = {
                    "kernel": _conv_w(sd[f"backbone.{name}.down_conv.weight"])
                }
                blk_p["down_bn"], blk_s["down_bn"] = {}, {}
                bn(blk_p["down_bn"], blk_s["down_bn"], f"backbone.{name}.down_bn")
            bb_p[name], bb_s[name] = blk_p, blk_s
    params["backbone"] = bb_p
    batch_stats["backbone"] = bb_s

    n_scales = len(cfg.stage_channels)
    for i in range(n_scales):
        params[f"reduce{i}"] = {
            "kernel": _conv_w(sd[f"reduce{i}.weight"]),
            "bias": jnp.asarray(sd[f"reduce{i}.bias"]),
        }
        params[f"scale_embed{i}"] = jnp.asarray(sd[f"scale_embed{i}"])

    def attn_block(prefix: str) -> dict:
        d = cfg.embed_dim
        h = cfg.num_heads
        w_in = sd[f"{prefix}.attn.in_proj_weight"]  # [3d, d]
        b_in = sd[f"{prefix}.attn.in_proj_bias"]
        wq, wk, wv = w_in[:d], w_in[d : 2 * d], w_in[2 * d :]
        bq, bk, bv = b_in[:d], b_in[d : 2 * d], b_in[2 * d :]
        def proj(w, b):
            return {
                "kernel": jnp.asarray(w.T.reshape(d, h, d // h)),
                "bias": jnp.asarray(b.reshape(h, d // h)),
            }
        wo = sd[f"{prefix}.attn.out_proj.weight"]
        return {
            "norm_q": {"scale": jnp.asarray(sd[f"{prefix}.norm_q.weight"]),
                       "bias": jnp.asarray(sd[f"{prefix}.norm_q.bias"])},
            "norm_kv": {"scale": jnp.asarray(sd[f"{prefix}.norm_kv.weight"]),
                        "bias": jnp.asarray(sd[f"{prefix}.norm_kv.bias"])},
            "norm_mlp": {"scale": jnp.asarray(sd[f"{prefix}.norm_mlp.weight"]),
                         "bias": jnp.asarray(sd[f"{prefix}.norm_mlp.bias"])},
            "attn": {
                "query": proj(wq, bq),
                "key": proj(wk, bk),
                "value": proj(wv, bv),
                "out": {
                    "kernel": jnp.asarray(wo.T.reshape(h, d // h, d)),
                    "bias": jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"]),
                },
            },
            "fc1": {"kernel": jnp.asarray(sd[f"{prefix}.fc1.weight"].T),
                    "bias": jnp.asarray(sd[f"{prefix}.fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[f"{prefix}.fc2.weight"].T),
                    "bias": jnp.asarray(sd[f"{prefix}.fc2.bias"])},
        }

    for j in range(cfg.num_attn_blocks):
        params[f"self{j}"] = attn_block(f"self{j}")
    for i in range(n_scales - 1):
        params[f"cross{i}"] = attn_block(f"cross{i}")
    for fc in ("head_fc1", "head_fc2"):
        params[fc] = {"kernel": jnp.asarray(sd[f"{fc}.weight"].T),
                      "bias": jnp.asarray(sd[f"{fc}.bias"])}
    return {"params": params, "batch_stats": batch_stats}


def topiq_score(model: CFANet, variables: dict, images: np.ndarray) -> np.ndarray:
    """uint8/float RGB [B,H,W,3] (or [H,W,3]) -> scores [B] (or scalar)."""
    one = images.ndim == 3
    x = np.asarray(images, np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    if one:
        x = x[None]
    scores = jax.jit(lambda v, im: model.apply(v, im, train=False))(
        variables, jnp.asarray(x)
    )
    out = np.asarray(scores)
    return float(out[0]) if one else out
