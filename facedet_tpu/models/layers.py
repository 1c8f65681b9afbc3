"""Common flax building blocks for the detector/SR model zoo.

These re-create the *architectures* the reference consumes through pip
packages (ultralytics YOLO blocks, utils/yolo_wrapper.py:55; basicsr RRDB,
utils/enhancer.py:11) as idiomatic NHWC flax modules: static shapes,
bfloat16-friendly compute with float32 params, BN folded at inference via
``use_running_average``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


def autopad(k: int) -> int:
    return k // 2


class ConvBnAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU — ultralytics ``Conv``.

    ``bn_dtype`` controls the BatchNorm/activation compute dtype. float32
    (default) matches training numerics; bfloat16 keeps inter-layer
    activations at 2 bytes — at inference BN is a folded affine, so this
    halves the HBM traffic between convs for ~0.4% relative noise.

    When the bound params carry a ``qkernel`` (produced by
    ``models/quantize.quantize_variables``), the module runs the int8
    serving path instead: symmetric per-tensor activation quant, int8 conv
    accumulating int32 on the MXU, then one fused per-channel affine (the
    activation/weight scales and the folded BatchNorm) + SiLU.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.has_variable("params", "qkernel"):
            return self._int8_forward(x)
        from facedet_tpu.models import quantize as _quantize

        if _quantize.CALIBRATING:
            self.sow(
                "calib", "absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.float32(0.0),
            )
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=autopad(self.kernel),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.bn_dtype,
            name="bn",
        )(x)
        return nn.silu(x) if self.act else x

    def _int8_forward(self, x):
        cin = x.shape[-1] // self.groups
        shape = (self.kernel, self.kernel, cin, self.features)
        qkernel = self.param(
            "qkernel", nn.initializers.zeros_init(), shape, jnp.int8
        )
        ascale = self.param(
            "ascale", nn.initializers.ones_init(), (), jnp.float32
        )
        oscale = self.param(
            "oscale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        obias = self.param(
            "obias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / ascale), -127.0, 127.0
        ).astype(jnp.int8)
        p = autopad(self.kernel)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, qkernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        acc = jax.lax.conv_general_dilated(
            xq, qkernel, (self.stride, self.stride), ((p, p), (p, p)),
            dimension_numbers=dn, feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        bdt = self.bn_dtype
        y = acc.astype(jnp.float32) * oscale + obias
        y = y.astype(bdt)
        return nn.silu(y) if self.act else y


class Bottleneck(nn.Module):
    """Two 3x3 convs with optional residual (ultralytics ``Bottleneck``)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    kernels: tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, self.kernels[0], dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv1")(x, train)
        y = ConvBnAct(self.features, self.kernels[1], dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP block with 3 convs and n inner bottlenecks (ultralytics ``C3k``)."""

    features: int
    n: int = 2
    shortcut: bool = True
    expansion: float = 0.5
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        a = ConvBnAct(hidden, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv1")(x, train)
        b = ConvBnAct(hidden, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                hidden,
                shortcut=self.shortcut,
                expansion=1.0,
                kernels=(self.kernel, self.kernel),
                dtype=self.dtype,
                bn_dtype=self.bn_dtype,
                name=f"m{i}",
            )(a, train)
        return ConvBnAct(self.features, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """YOLOv11's C2f-with-C3k-option block (ultralytics ``C3k2``)."""

    features: int
    n: int = 1
    c3k: bool = False
    expansion: float = 0.5
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(2 * hidden, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv1")(x, train)
        parts = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            if self.c3k:
                nxt = C3k(hidden, n=2, shortcut=self.shortcut, dtype=self.dtype, bn_dtype=self.bn_dtype, name=f"m{i}")(
                    parts[-1], train
                )
            else:
                nxt = Bottleneck(
                    hidden, shortcut=self.shortcut, expansion=0.5, dtype=self.dtype, bn_dtype=self.bn_dtype, name=f"m{i}"
                )(parts[-1], train)
            parts.append(nxt)
        return ConvBnAct(self.features, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained stride-1 maxpools."""

    features: int
    pool: int = 5
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        y = ConvBnAct(hidden, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv1")(x, train)
        outs = [y]
        for _ in range(3):
            outs.append(
                nn.max_pool(
                    outs[-1],
                    (self.pool, self.pool),
                    strides=(1, 1),
                    padding=((self.pool // 2,) * 2, (self.pool // 2,) * 2),
                )
            )
        return ConvBnAct(self.features, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv2")(
            jnp.concatenate(outs, axis=-1), train
        )


class PSAAttention(nn.Module):
    """Position-sensitive attention over the HxW grid (ultralytics ``Attention``).

    Maps cleanly to the MXU: qk/v projections are 1x1 convs (= matmuls over the
    flattened grid) and the attention itself is two [N, N] matmuls per head.
    """

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh_kd = key_dim * self.num_heads
        qkv = ConvBnAct(self.dim + 2 * nh_kd, 1, act=False, dtype=self.dtype, bn_dtype=self.bn_dtype, name="qkv")(
            x, train
        )
        qkv = qkv.reshape(b, n, self.num_heads, 2 * key_dim + head_dim)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim : 2 * key_dim]
        v = qkv[..., 2 * key_dim :]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (key_dim**-0.5), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        vmap = v.reshape(b, h, w, self.dim)
        pe = ConvBnAct(
            self.dim, 3, groups=self.dim, act=False, dtype=self.dtype, bn_dtype=self.bn_dtype, name="pe"
        )(vmap, train)
        out = out + pe
        return ConvBnAct(self.dim, 1, act=False, dtype=self.dtype, bn_dtype=self.bn_dtype, name="proj")(out, train)


class PSABlock(nn.Module):
    features: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + PSAAttention(
            self.features, num_heads=self.num_heads, dtype=self.dtype, bn_dtype=self.bn_dtype, name="attn"
        )(x, train)
        y = ConvBnAct(self.features * 2, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="ffn0")(x, train)
        y = ConvBnAct(self.features, 1, act=False, dtype=self.dtype, bn_dtype=self.bn_dtype, name="ffn1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """Cross-stage partial block with PSA attention (ultralytics ``C2PSA``)."""

    features: int
    n: int = 1
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32
    bn_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(2 * hidden, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv1")(x, train)
        a, b = y[..., :hidden], y[..., hidden:]
        for i in range(self.n):
            b = PSABlock(
                hidden, num_heads=max(1, hidden // 64), dtype=self.dtype, bn_dtype=self.bn_dtype, name=f"m{i}"
            )(b, train)
        return ConvBnAct(self.features, 1, dtype=self.dtype, bn_dtype=self.bn_dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
