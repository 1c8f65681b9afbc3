"""RT-DETR detector in flax (reference trains/infers it through
``ultralytics.RTDETR`` — pipeline_v3_RTDETR/train_rtdetr.py:162-218,
inference.py:12-163; RT-DETR-L, imgsz 640, single 'face' class).

Architecture per the published RT-DETR design, TPU-first:
  * ResNet-style backbone with stride 8/16/32 outputs (HGNetv2 stand-in).
  * Hybrid encoder: AIFI — a transformer encoder layer on the stride-32 map
    with 2D sincos positional embedding (one big MXU matmul chain) — plus
    CCFF cross-scale FPN/PAN fusion.
  * Transformer decoder with multi-scale deformable cross-attention
    (bilinear sampling = gathers + weighted sums, fully vectorised, no
    dynamic shapes), IoU-aware top-K query selection from encoder tokens, and
    iterative box refinement in inverse-sigmoid space.
  * Heads: per-layer class logits + cxcywh boxes (sigmoid, normalised).

Static shapes throughout: num_queries fixed (300), GT padded — no
data-dependent control flow under jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["RtDetrConfig", "RtDetr", "create_rtdetr", "decode_rtdetr"]


@dataclasses.dataclass(frozen=True)
class RtDetrConfig:
    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 300
    num_heads: int = 8
    num_decoder_layers: int = 6
    num_points: int = 4  # deformable sampling points per head per level
    ffn_dim: int = 1024
    backbone_widths: tuple[int, int, int, int] = (64, 128, 256, 512)
    backbone_depths: tuple[int, int, int, int] = (2, 2, 2, 2)
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


RTDETR_VARIANTS = {
    "rtdetr-l": RtDetrConfig(),
    # mid-capacity preset: enough backbone width to resolve small faces in
    # 480-640px crops while staying cheap enough for from-scratch demos
    "rtdetr-m": RtDetrConfig(
        hidden_dim=128,
        num_queries=120,
        num_heads=8,
        num_decoder_layers=3,
        ffn_dim=512,
        backbone_widths=(16, 32, 64, 128),
        backbone_depths=(1, 2, 2, 1),
    ),
    "rtdetr-tiny": RtDetrConfig(
        hidden_dim=64,
        num_queries=60,
        num_heads=4,
        num_decoder_layers=2,
        ffn_dim=128,
        backbone_widths=(8, 16, 24, 32),
        backbone_depths=(1, 1, 1, 1),
    ),
}


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=self.kernel // 2,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


class Backbone(nn.Module):
    cfg: RtDetrConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        x = ConvBnRelu(cfg.backbone_widths[0] // 2, 3, 2, dt, name="stem0")(x, train)
        x = ConvBnRelu(cfg.backbone_widths[0], 3, 1, dt, name="stem1")(x, train)
        outs = []
        for stage, (w, d) in enumerate(zip(cfg.backbone_widths, cfg.backbone_depths)):
            for i in range(d):
                stride = 2 if i == 0 else 1
                y = ConvBnRelu(w, 3, stride, dt, name=f"s{stage}_c{i}a")(x, train)
                y = nn.Conv(w, (3, 3), padding=1, use_bias=False, dtype=dt, name=f"s{stage}_c{i}b")(y)
                y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name=f"s{stage}_c{i}bn")(y)
                if x.shape[-1] != w or stride != 1:
                    x = nn.Conv(w, (1, 1), (stride, stride), use_bias=False, dtype=dt, name=f"s{stage}_c{i}p")(x)
                    x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name=f"s{stage}_c{i}pbn")(x)
                x = nn.relu(x + y)
            if stage >= 1:
                outs.append(x)
        return outs  # strides 8, 16, 32


def sincos_pos_embed_2d(h: int, w: int, dim: int, temperature: float = 10000.0) -> jax.Array:
    """[h*w, dim] 2D sincos embedding (AIFI positional encoding)."""
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    out_x = xs.reshape(-1, 1) * omega[None]
    out_y = ys.reshape(-1, 1) * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_x), jnp.cos(out_x), jnp.sin(out_y), jnp.cos(out_y)], axis=1
    )


class Aifi(nn.Module):
    """One transformer encoder layer on the flattened stride-32 map."""

    cfg: RtDetrConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        pos = sincos_pos_embed_2d(h, w, c).astype(dt)
        q = tokens + pos[None]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=dt, name="self_attn"
        )(q, q, tokens)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="ln1")(tokens + attn)
        y = nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn0")(tokens)
        y = nn.Dense(c, dtype=dt, name="ffn1")(nn.gelu(y))
        tokens = nn.LayerNorm(dtype=jnp.float32, name="ln2")(tokens + y)
        return tokens.reshape(b, h, w, c)


class Ccff(nn.Module):
    """Cross-scale feature fusion (FPN + PAN with conv blocks)."""

    cfg: RtDetrConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        c = cfg.hidden_dim
        p = [
            ConvBnRelu(c, 1, 1, dt, name=f"proj{i}")(f, train) for i, f in enumerate(feats)
        ]
        p[2] = Aifi(cfg, name="aifi")(p[2], train)
        # top-down
        for i in (1, 0):
            up = jax.image.resize(p[i + 1], p[i].shape, "nearest")
            p[i] = ConvBnRelu(c, 3, 1, dt, name=f"fuse_td{i}")(
                jnp.concatenate([p[i], up], -1), train
            )
        # bottom-up
        for i in (1, 2):
            down = ConvBnRelu(c, 3, 2, dt, name=f"down{i}")(p[i - 1], train)
            p[i] = ConvBnRelu(c, 3, 1, dt, name=f"fuse_bu{i}")(
                jnp.concatenate([p[i], down], -1), train
            )
        return p


def _bilinear_sample(feat: jax.Array, coords: jax.Array) -> jax.Array:
    """feat [H,W,C], coords [N,2] (x, y) pixel space -> [N,C] with zero pad."""
    h, w, c = feat.shape
    x, y = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[:, None]
    dy = (y - y0)[:, None]

    def at(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return feat[yy, xx] * valid[:, None]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


class MsDeformAttn(nn.Module):
    """Multi-scale deformable attention over 3 feature levels."""

    cfg: RtDetrConfig

    @nn.compact
    def __call__(self, query, ref_points, value_feats, train: bool = False):
        """query [B,Q,D]; ref_points [B,Q,4] cxcywh in [0,1];
        value_feats: list of [B,Hi,Wi,D]."""
        cfg, dt = self.cfg, self.cfg.compute_dtype
        nh, npts, nl = cfg.num_heads, cfg.num_points, len(value_feats)
        d = cfg.hidden_dim
        dh = d // nh
        b, q, _ = query.shape

        offsets = nn.Dense(nh * nl * npts * 2, dtype=dt, name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npts, 2)
        weights = nn.Dense(nh * nl * npts, dtype=dt, name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(b, q, nh, nl * npts).astype(jnp.float32), axis=-1
        ).reshape(b, q, nh, nl, npts)

        values = [
            nn.Dense(d, dtype=dt, name=f"value_proj{i}")(f) for i, f in enumerate(value_feats)
        ]

        ref_xy = ref_points[..., :2]
        ref_wh = ref_points[..., 2:]
        out = jnp.zeros((b, q, nh, dh), jnp.float32)
        for li, val in enumerate(values):
            hgt, wid = val.shape[1], val.shape[2]
            # sampling locations normalized, modulated by box size
            loc = (
                ref_xy[:, :, None, None, :]
                + offsets[:, :, :, li, :, :] / npts * ref_wh[:, :, None, None, :] * 0.5
            )  # [B,Q,H,P,2]
            px = loc[..., 0] * wid - 0.5
            py = loc[..., 1] * hgt - 0.5
            coords = jnp.stack([px, py], -1).reshape(b, q * nh * npts, 2)
            vh = val.reshape(b, hgt, wid, nh, dh)

            def sample_one(feat_b, coords_b):
                flat = feat_b.reshape(hgt, wid, nh * dh)
                got = _bilinear_sample(flat, coords_b)  # [N, nh*dh]
                return got

            sampled = jax.vmap(sample_one)(vh, coords)  # [B, Q*H*P, nh*dh]
            sampled = sampled.reshape(b, q, nh, npts, nh, dh)
            # take each head's own channels
            idx = jnp.arange(nh)
            sampled = sampled[:, :, idx, :, idx, :].transpose(1, 2, 0, 3, 4)  # [B,Q,H,P,dh]
            out = out + jnp.sum(
                sampled.astype(jnp.float32) * weights[:, :, :, li, :, None], axis=3
            )
        out = out.reshape(b, q, d).astype(dt)
        return nn.Dense(d, dtype=dt, name="output_proj")(out)


class DecoderLayer(nn.Module):
    cfg: RtDetrConfig

    @nn.compact
    def __call__(self, query, ref_points, feats, query_pos, train: bool = False, attn_mask=None):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        q = query + query_pos
        sa = nn.MultiHeadDotProductAttention(num_heads=cfg.num_heads, dtype=dt, name="self_attn")(
            q, q, query, mask=attn_mask
        )
        query = nn.LayerNorm(dtype=jnp.float32, name="ln1")(query + sa)
        ca = MsDeformAttn(cfg, name="cross_attn")(query + query_pos, ref_points, feats, train)
        query = nn.LayerNorm(dtype=jnp.float32, name="ln2")(query + ca)
        y = nn.Dense(cfg.ffn_dim, dtype=dt, name="ffn0")(query)
        y = nn.Dense(cfg.hidden_dim, dtype=dt, name="ffn1")(nn.relu(y))
        return nn.LayerNorm(dtype=jnp.float32, name="ln3")(query + y)


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def dn_attention_mask(n_dn: int, num_groups: int, num_queries: int) -> jax.Array:
    """Decoder self-attention mask for CDN (True = may attend).

    Leakage rules: matching queries never see denoising queries (they encode
    GT); denoising group i never sees group j != i (each group is an
    independently noised copy of the GT set); everyone may see the matching
    block. All sizes static -> the mask is a compile-time constant."""
    total = n_dn + num_queries
    group = jnp.arange(n_dn) // max(n_dn // num_groups, 1)
    mask = jnp.zeros((total, total), bool)
    # matching <-> matching
    mask = mask.at[n_dn:, n_dn:].set(True)
    # dn -> matching
    mask = mask.at[:n_dn, n_dn:].set(True)
    # dn -> same group
    mask = mask.at[:n_dn, :n_dn].set(group[:, None] == group[None, :])
    return mask


class RtDetr(nn.Module):
    """images [B,H,W,3] in [0,1] -> dict with per-layer logits/boxes +
    encoder outputs (for aux losses).

    Training may pass contrastive-denoising (CDN) queries — noised-GT boxes
    with known assignments (``dn_labels`` [B,N] class ids where
    ``num_classes`` = background, ``dn_ref`` [B,N,4] cxcywh, ``dn_groups``
    static group count). They prepend the matching queries through the decoder
    behind a leakage-blocking self-attention mask and come back as
    ``dn_logits``/``dn_boxes`` per layer. CDN is the from-scratch convergence
    equalizer for the reference's pretrained-init fine-tune
    (pipeline_v3_RTDETR/train_rtdetr.py:162)."""

    cfg: RtDetrConfig

    @nn.compact
    def __call__(self, x, train: bool = False, dn_labels=None, dn_ref=None, dn_groups: int = 0):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        # always materialised so checkpoints are CDN-ready regardless of the
        # first trace's arguments
        dn_table = self.param(
            "dn_embed",
            nn.initializers.normal(0.02),
            (cfg.num_classes + 1, cfg.hidden_dim),
        )
        x = x.astype(dt)
        feats = Backbone(cfg, name="backbone")(x, train)
        feats = Ccff(cfg, name="encoder")(feats, train)
        b = x.shape[0]

        # --- IoU-aware query selection from flattened encoder tokens ---
        tokens = jnp.concatenate([f.reshape(b, -1, cfg.hidden_dim) for f in feats], 1)
        anchors = []
        for f, stride_frac in zip(feats, (1 / 8, 1 / 16, 1 / 32)):
            hgt, wid = f.shape[1], f.shape[2]
            ys = (jnp.arange(hgt) + 0.5) / hgt
            xs = (jnp.arange(wid) + 0.5) / wid
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            wh = jnp.full((hgt * wid, 2), 0.05 / stride_frac / 4)
            anchors.append(
                jnp.concatenate([jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1), wh], -1)
            )
        anchors = jnp.concatenate(anchors, 0)  # [S,4] cxcywh normalized

        enc_tokens = nn.LayerNorm(dtype=jnp.float32, name="enc_norm")(tokens)
        enc_logits = nn.Dense(cfg.num_classes, dtype=dt, name="enc_score")(enc_tokens)
        enc_delta = nn.Dense(4, dtype=dt, name="enc_bbox")(enc_tokens)
        enc_boxes = jax.nn.sigmoid(
            enc_delta.astype(jnp.float32) + inverse_sigmoid(anchors)[None]
        )

        score = jnp.max(enc_logits.astype(jnp.float32), -1)
        k = min(cfg.num_queries, score.shape[1])
        _, top_idx = jax.lax.top_k(score, k)  # [B,K]
        take = lambda arr: jnp.take_along_axis(
            arr, top_idx[..., None].repeat(arr.shape[-1], -1), axis=1
        )
        ref = take(enc_boxes)  # [B,K,4]
        query = take(enc_tokens).astype(dt)

        n_dn = 0
        attn_mask = None
        if dn_labels is not None:
            n_dn = dn_labels.shape[1]
            query = jnp.concatenate([dn_table[dn_labels].astype(dt), query], axis=1)
            ref = jnp.concatenate([dn_ref.astype(jnp.float32), ref], axis=1)
            attn_mask = dn_attention_mask(n_dn, max(dn_groups, 1), k)[None, None]

        outputs = {"enc_logits": enc_logits, "enc_boxes": enc_boxes}
        layer_logits, layer_boxes = [], []
        dn_logits, dn_boxes = [], []
        for li in range(cfg.num_decoder_layers):
            query_pos = nn.Dense(cfg.hidden_dim, dtype=dt, name=f"qpos{li}")(
                inverse_sigmoid(ref).astype(dt)
            )
            query = DecoderLayer(cfg, name=f"layer{li}")(
                query, ref, feats, query_pos, train, attn_mask=attn_mask
            )
            logits = nn.Dense(cfg.num_classes, dtype=dt, name=f"cls{li}")(query)
            delta = nn.Dense(4, dtype=dt, name=f"box{li}")(query)
            ref = jax.nn.sigmoid(delta.astype(jnp.float32) + inverse_sigmoid(ref))
            ref = jax.lax.stop_gradient(ref) if li < cfg.num_decoder_layers - 1 else ref
            layer_logits.append(logits[:, n_dn:].astype(jnp.float32))
            layer_boxes.append(ref[:, n_dn:])
            if n_dn:
                dn_logits.append(logits[:, :n_dn].astype(jnp.float32))
                dn_boxes.append(ref[:, :n_dn])
        outputs["logits"] = layer_logits
        outputs["boxes"] = layer_boxes
        if n_dn:
            outputs["dn_logits"] = dn_logits
            outputs["dn_boxes"] = dn_boxes
        return outputs


def decode_rtdetr(outputs: dict, image_size: int) -> dict:
    """Final layer -> flat {boxes [B,Q,4] xyxy px, scores [B,Q,C]} (DETR-style:
    no NMS needed)."""
    logits = outputs["logits"][-1]
    boxes = outputs["boxes"][-1]  # cxcywh normalized
    cx, cy, w, h = jnp.split(boxes, 4, -1)
    xyxy = jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1
    ) * image_size
    return {"boxes": xyxy, "scores": jax.nn.sigmoid(logits)}


def create_rtdetr(cfg: RtDetrConfig, rng: jax.Array, image_size: int = 640):
    model = RtDetr(cfg)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
    return model, variables
