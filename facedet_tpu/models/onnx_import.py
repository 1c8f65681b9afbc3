"""ONNX -> JAX importer: load pretrained detector graphs without onnxruntime.

The reference runs its RetinaFace/SCRFD family through insightface's
pretrained ONNX checkpoints on onnxruntime-gpu (utils/insightface_wrapper.py:
38-44, docs sahi/retinaface_sahi.py:66-75). On TPU there is no onnxruntime;
this module makes the same ``.onnx`` files first-class citizens:

  1. a dependency-free protobuf *wire format* parser for the ONNX schema
     subset that model files use (the ``onnx`` pip package is not available in
     TPU images, and the wire format is stable by protobuf's compatibility
     rules), and
  2. a graph executor that binds each node to a JAX op, yielding a pure
     ``fn(params, x)`` that jit-compiles through XLA and vmaps over a SAHI
     tile batch.

Weights become a flat ``params`` dict (a pytree leaf per initializer), so the
imported model shards/donates like any native flax model. Shape-manipulation
chains (Shape -> Gather -> Unsqueeze -> Concat -> Reshape) are constant-folded
at trace time on static shapes, which is exactly XLA's static-shape contract.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["parse_onnx", "OnnxGraph", "OnnxModule", "import_onnx"]


# ---------------------------------------------------------------------------
# protobuf wire-format decoding (schema-agnostic layer)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt protobuf)")


def _decode_message(buf: bytes) -> dict[int, list[tuple[int, Any]]]:
    """Decode one protobuf message into {field_number: [(wire_type, raw)]}.

    raw is: int for wire 0 (varint), bytes for wire 2 (length-delimited),
    4/8-byte bytes for wires 5/1. Groups (3/4) are not used by ONNX."""
    fields: dict[int, list[tuple[int, Any]]] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 0x7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire} for field {field_no}")
        fields.setdefault(field_no, []).append((wire, val))
    return fields


def _signed(v: int) -> int:
    """Interpret a varint as two's-complement int64 (protobuf int64)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _scalar_int(fields, no, default=0):
    vals = fields.get(no)
    return _signed(vals[-1][1]) if vals else default


def _scalar_bytes(fields, no, default=b""):
    vals = fields.get(no)
    return vals[-1][1] if vals else default


def _repeated_int(fields, no) -> list[int]:
    out: list[int] = []
    for wire, raw in fields.get(no, []):
        if wire == 0:
            out.append(_signed(raw))
        else:  # packed
            pos = 0
            while pos < len(raw):
                v, pos = _read_varint(raw, pos)
                out.append(_signed(v))
    return out


def _repeated_float(fields, no) -> list[float]:
    out: list[float] = []
    for wire, raw in fields.get(no, []):
        if wire == 5:
            out.append(struct.unpack("<f", raw)[0])
        else:  # packed
            out.extend(struct.unpack(f"<{len(raw) // 4}f", raw))
    return out


# ---------------------------------------------------------------------------
# ONNX schema subset (field numbers per onnx.proto3, frozen by protobuf
# compatibility rules)
# ---------------------------------------------------------------------------

_TENSOR_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    f = _decode_message(buf)
    dims = _repeated_int(f, 1)
    dtype_code = _scalar_int(f, 2, 1)
    name = _scalar_bytes(f, 8).decode()
    np_dtype = _TENSOR_DTYPES.get(dtype_code)
    if np_dtype is None:
        raise ValueError(f"tensor {name!r}: unsupported data_type {dtype_code}")
    raw = _scalar_bytes(f, 9, None)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif dtype_code == 1:
        arr = np.asarray(_repeated_float(f, 4), np.float32)
    elif dtype_code == 7:
        arr = np.asarray(_repeated_int(f, 7), np.int64)
    elif dtype_code in (6, 9, 10):  # int32/bool/fp16 ride in int32_data
        arr = np.asarray(_repeated_int(f, 5))
        if dtype_code == 10:
            arr = arr.astype(np.uint16).view(np.float16)
        else:
            arr = arr.astype(np_dtype)
    elif dtype_code == 11:
        raw64 = b"".join(r for w, r in f.get(10, []) if w != 0)
        arr = np.frombuffer(raw64, np.float64)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


@dataclasses.dataclass
class OnnxAttr:
    name: str
    value: Any


def _parse_attribute(buf: bytes) -> OnnxAttr:
    f = _decode_message(buf)
    name = _scalar_bytes(f, 1).decode()
    atype = _scalar_int(f, 20, 0)
    if atype == 1:  # FLOAT
        value = struct.unpack("<f", f[2][-1][1])[0]
    elif atype == 2:  # INT
        value = _scalar_int(f, 3)
    elif atype == 3:  # STRING
        value = _scalar_bytes(f, 4).decode(errors="replace")
    elif atype == 4:  # TENSOR
        value = _parse_tensor(f[5][-1][1])[1]
    elif atype == 6:  # FLOATS
        value = _repeated_float(f, 7)
    elif atype == 7:  # INTS
        value = _repeated_int(f, 8)
    elif atype == 8:  # STRINGS
        value = [raw.decode(errors="replace") for _, raw in f.get(9, [])]
    else:  # infer from whichever field is present (legacy exporters omit type)
        if 3 in f:
            value = _scalar_int(f, 3)
        elif 2 in f:
            value = struct.unpack("<f", f[2][-1][1])[0]
        elif 8 in f:
            value = _repeated_int(f, 8)
        elif 4 in f:
            value = _scalar_bytes(f, 4).decode(errors="replace")
        else:
            value = None
    return OnnxAttr(name, value)


@dataclasses.dataclass
class OnnxNode:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict[str, Any]
    name: str = ""


@dataclasses.dataclass
class OnnxGraph:
    nodes: list[OnnxNode]
    initializers: dict[str, np.ndarray]
    input_names: list[str]
    output_names: list[str]
    input_shapes: dict[str, list[int]]
    name: str = ""


def _parse_value_info(buf: bytes) -> tuple[str, list[int]]:
    f = _decode_message(buf)
    name = _scalar_bytes(f, 1).decode()
    shape: list[int] = []
    type_buf = _scalar_bytes(f, 2, None)
    if type_buf:
        tf = _decode_message(type_buf)
        tt = tf.get(1)  # TypeProto.tensor_type
        if tt:
            ttf = _decode_message(tt[-1][1])
            sh = ttf.get(2)  # TensorTypeProto.shape
            if sh:
                for _, dim_buf in _decode_message(sh[-1][1]).get(1, []):
                    df = _decode_message(dim_buf)
                    shape.append(_scalar_int(df, 1, -1) if 1 in df else -1)
    return name, shape


def _parse_graph(buf: bytes) -> OnnxGraph:
    f = _decode_message(buf)
    nodes = []
    for _, nbuf in f.get(1, []):
        nf = _decode_message(nbuf)
        nodes.append(
            OnnxNode(
                op_type=_scalar_bytes(nf, 4).decode(),
                inputs=[raw.decode() for _, raw in nf.get(1, [])],
                outputs=[raw.decode() for _, raw in nf.get(2, [])],
                attrs={
                    a.name: a.value
                    for a in (_parse_attribute(abuf) for _, abuf in nf.get(5, []))
                },
                name=_scalar_bytes(nf, 3).decode(),
            )
        )
    initializers = dict(_parse_tensor(tbuf) for _, tbuf in f.get(5, []))
    inputs, shapes = [], {}
    for _, vbuf in f.get(11, []):
        nm, sh = _parse_value_info(vbuf)
        if nm not in initializers:  # old exporters list weights as inputs too
            inputs.append(nm)
            shapes[nm] = sh
    outputs = [_parse_value_info(vbuf)[0] for _, vbuf in f.get(12, [])]
    return OnnxGraph(nodes, initializers, inputs, outputs, shapes,
                     name=_scalar_bytes(f, 2).decode())


def parse_onnx(path: str) -> OnnxGraph:
    """Parse a serialized ONNX ModelProto into an :class:`OnnxGraph`."""
    with open(path, "rb") as fh:
        buf = fh.read()
    model = _decode_message(buf)
    if 7 not in model:
        raise ValueError(f"{path}: no GraphProto (field 7) — not an ONNX model?")
    return _parse_graph(model[7][-1][1])


# ---------------------------------------------------------------------------
# JAX executor
# ---------------------------------------------------------------------------

def _is_static(x) -> bool:
    """Static (trace-time-known) value: numpy, not a traced jax array."""
    return isinstance(x, (np.ndarray, np.generic, int, float, list, tuple))


def _pool_padding(attrs, spatial_rank):
    pads = attrs.get("pads")
    if pads:
        half = len(pads) // 2
        return [(int(pads[i]), int(pads[i + half])) for i in range(spatial_rank)]
    auto = attrs.get("auto_pad", "NOTSET")
    if auto in ("NOTSET", "", "VALID"):
        return [(0, 0)] * spatial_rank
    raise NotImplementedError(f"auto_pad={auto!r}")


def _op_conv(env, node):
    x = env[node.inputs[0]]
    w = env[node.inputs[1]]
    b = env[node.inputs[2]] if len(node.inputs) > 2 else None
    a = node.attrs
    rank = x.ndim - 2
    strides = a.get("strides", [1] * rank)
    dilations = a.get("dilations", [1] * rank)
    groups = int(a.get("group", 1))
    padding = _pool_padding(a, rank)
    if a.get("auto_pad") in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if rank == 2 else ("NCH", "OIH", "NCH"),
    )
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w),
        window_strides=[int(s) for s in strides],
        padding=padding,
        rhs_dilation=[int(d) for d in dilations],
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * rank)
    return out


def _op_batchnorm(env, node):
    x, scale, bias, mean, var = (env[i] for i in node.inputs[:5])
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(jnp.asarray(var, jnp.float32) + eps)
    return (x - jnp.asarray(mean).reshape(shape)) * (
        jnp.asarray(scale) * inv
    ).reshape(shape) + jnp.asarray(bias).reshape(shape)


def _op_gemm(env, node):
    a_ = env[node.inputs[0]]
    b_ = env[node.inputs[1]]
    at = node.attrs.get("transA", 0)
    bt = node.attrs.get("transB", 0)
    alpha = node.attrs.get("alpha", 1.0)
    beta = node.attrs.get("beta", 1.0)
    a_ = a_.T if at else a_
    b_ = jnp.asarray(b_).T if bt else jnp.asarray(b_)
    out = alpha * (a_ @ b_)
    if len(node.inputs) > 2:
        out = out + beta * jnp.asarray(env[node.inputs[2]])
    return out


def _op_resize(env, node):
    # Resize (opset 10+) / Upsample (opset <10): nearest or linear, scales or
    # explicit sizes. Detector necks only upsample by integer factors.
    x = env[node.inputs[0]]
    a = node.attrs
    mode = a.get("mode", "nearest")
    sizes = None
    if node.op_type == "Upsample":
        scales = a.get("scales") or np.asarray(env[node.inputs[1]])
    else:
        scales = None
        if len(node.inputs) == 2 and node.inputs[1] in env:
            # opset-10 Resize(X, scales) two-input form
            s = np.asarray(env[node.inputs[1]])
            scales = s if s.size else None
        if scales is None and len(node.inputs) > 2 and node.inputs[2] and node.inputs[2] in env:
            s = np.asarray(env[node.inputs[2]])
            scales = s if s.size else None
        if scales is None and len(node.inputs) > 3 and node.inputs[3] in env:
            sizes = [int(v) for v in np.asarray(env[node.inputs[3]])]
        if scales is None and sizes is None:
            raise NotImplementedError(
                f"Resize node {node.name!r}: neither scales nor sizes resolved"
            )
    if sizes is None:
        scales = [float(s) for s in np.asarray(scales).reshape(-1)]
        sizes = [int(round(d * s)) for d, s in zip(x.shape, scales)]
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
    return jax.image.resize(x, tuple(sizes), method=method)


def _reduce_axes(env, n):
    """Reduce* axes: the `axes` attribute (opset < 18) or the optional second
    input (opset >= 18). Absent/empty axes reduce over ALL axes unless the
    node sets noop_with_empty_axes=1, in which case the op is identity
    (axis=() performs no reduction)."""
    axes = None
    if "axes" in n.attrs:
        ax = np.asarray(n.attrs["axes"]).reshape(-1)
        axes = tuple(int(a) for a in ax) if ax.size else None
    elif len(n.inputs) > 1 and n.inputs[1] and n.inputs[1] in env:
        ax = np.asarray(env[n.inputs[1]]).reshape(-1)
        axes = tuple(int(a) for a in ax) if ax.size else None
    if axes is not None:
        return axes
    if n.attrs.get("noop_with_empty_axes", 0):
        return ()
    return tuple(range(env[n.inputs[0]].ndim))


def _op_pad(env, n):
    """Pad with mode support (constant/reflect/edge) and the opset-11+
    constant_value input; raises on unsupported modes instead of silently
    zero-padding."""
    x = env[n.inputs[0]]
    pads = np.asarray(
        n.attrs.get("pads") if "pads" in n.attrs else env[n.inputs[1]]
    ).reshape(-1)
    if len(n.inputs) > 3 and n.inputs[3] and n.inputs[3] in env:
        # opset-18 optional `axes` input: pads has 2*len(axes) entries in axes
        # order; expand to full rank (unlisted dims unpadded)
        axes = [int(a) % x.ndim for a in np.asarray(env[n.inputs[3]]).reshape(-1)]
        starts, ends = np.split(pads, 2)
        full = np.zeros(2 * x.ndim, dtype=np.int64)
        for a, s, e in zip(axes, starts, ends):
            full[a], full[x.ndim + a] = s, e
        pads = full
    width = [(int(p0), int(p1)) for p0, p1 in zip(*np.split(pads, 2))]
    mode = n.attrs.get("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if mode == "constant":
        cval = n.attrs.get("value", 0.0)
        if len(n.inputs) > 2 and n.inputs[2] and n.inputs[2] in env:
            cval = float(np.asarray(env[n.inputs[2]]).reshape(()))
        return jnp.pad(x, width, constant_values=cval)
    if mode in ("reflect", "edge"):
        return jnp.pad(x, width, mode={"reflect": "reflect", "edge": "edge"}[mode])
    raise NotImplementedError(f"Pad mode {mode!r} is not supported")


def _np_or_jnp(*vals):
    return np if all(_is_static(v) for v in vals) else jnp


def _binop(fn_np, fn_jnp):
    def op(env, node):
        x, y = env[node.inputs[0]], env[node.inputs[1]]
        return (fn_np if _np_or_jnp(x, y) is np else fn_jnp)(x, y)

    return op


def _op_pool(env, node, reducer, init, average=False):
    x = env[node.inputs[0]]
    a = node.attrs
    rank = x.ndim - 2
    k = [int(v) for v in a["kernel_shape"]]
    strides = [int(v) for v in a.get("strides", [1] * rank)]
    padding = _pool_padding(a, rank)
    window = (1, 1) + tuple(k)
    strides_full = (1, 1) + tuple(strides)
    pads_full = ((0, 0), (0, 0)) + tuple(padding)
    out = jax.lax.reduce_window(x, init, reducer, window, strides_full, pads_full)
    if average:
        ones = jnp.ones_like(x)
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, window, strides_full, pads_full
        )
        out = out / counts
    return out


def _op_grid_sample(env, node):
    """GridSample (opset 16+): the op ultralytics RT-DETR exports emit for
    deformable-attention sampling. X [N,C,H,W], grid [N,Ho,Wo,2] in [-1,1]
    (x, y); bilinear/nearest, zeros/border padding."""
    x = env[node.inputs[0]]
    grid = env[node.inputs[1]]
    a = node.attrs
    mode = a.get("mode", "bilinear")
    padding = a.get("padding_mode", "zeros")
    align = bool(a.get("align_corners", 0))
    n, c, h, w = x.shape

    gx, gy = grid[..., 0], grid[..., 1]
    if align:
        px = (gx + 1.0) * 0.5 * (w - 1)
        py = (gy + 1.0) * 0.5 * (h - 1)
    else:
        px = ((gx + 1.0) * w - 1.0) * 0.5
        py = ((gy + 1.0) * h - 1.0) * 0.5

    def sample(feat, pxb, pyb):  # feat [C,H,W]; pxb/pyb [Ho,Wo]
        if mode == "nearest":
            xi = jnp.round(pxb).astype(jnp.int32)
            yi = jnp.round(pyb).astype(jnp.int32)
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi = jnp.clip(xi, 0, w - 1)
            yi = jnp.clip(yi, 0, h - 1)
            out = feat[:, yi, xi]
            if padding == "zeros":
                out = out * inside[None]
            return out
        x0 = jnp.floor(pxb)
        y0 = jnp.floor(pyb)
        dx = pxb - x0
        dy = pyb - y0

        def at(yi, xi):
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
            v = feat[:, yi, xi]
            return v * inside[None] if padding == "zeros" else v

        return (
            at(y0, x0) * ((1 - dx) * (1 - dy))[None]
            + at(y0, x0 + 1) * (dx * (1 - dy))[None]
            + at(y0 + 1, x0) * ((1 - dx) * dy)[None]
            + at(y0 + 1, x0 + 1) * (dx * dy)[None]
        )

    return jax.vmap(sample)(x, px, py)


def _op_topk(env, node):
    x = env[node.inputs[0]]
    k = int(np.asarray(env[node.inputs[1]]).reshape(()))
    axis = node.attrs.get("axis", -1)
    largest = node.attrs.get("largest", 1)
    moved = jnp.moveaxis(x, axis, -1)
    vals, idx = jax.lax.top_k(moved if largest else -moved, k)
    if not largest:
        vals = -vals
    return (
        jnp.moveaxis(vals, -1, axis),
        jnp.moveaxis(idx.astype(jnp.int64), -1, axis),
    )


def _op_layernorm(env, node):
    x = env[node.inputs[0]]
    scale = jnp.asarray(env[node.inputs[1]])
    axis = node.attrs.get("axis", -1)
    eps = node.attrs.get("epsilon", 1e-5)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mu = jnp.mean(x, axes, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axes, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps) * scale
    if len(node.inputs) > 2 and node.inputs[2]:
        out = out + jnp.asarray(env[node.inputs[2]])
    return out


def _op_slice(env, node):
    x = env[node.inputs[0]]
    a = node.attrs
    if "starts" in a:  # opset 9
        starts, ends = a["starts"], a["ends"]
        axes = a.get("axes", list(range(len(starts))))
        steps = [1] * len(starts)
    else:  # opset 10+: runtime inputs (must be static)
        starts = [int(v) for v in np.asarray(env[node.inputs[1]])]
        ends = [int(v) for v in np.asarray(env[node.inputs[2]])]
        axes = (
            [int(v) for v in np.asarray(env[node.inputs[3]])]
            if len(node.inputs) > 3 and node.inputs[3]
            else list(range(len(starts)))
        )
        steps = (
            [int(v) for v in np.asarray(env[node.inputs[4]])]
            if len(node.inputs) > 4 and node.inputs[4]
            else [1] * len(starts)
        )
    idx = [slice(None)] * x.ndim
    for ax, s, e, st in zip(axes, starts, ends, steps):
        idx[ax] = slice(s, None if e >= (1 << 31) else e, st)
    return x[tuple(idx)]


_OPS: dict[str, Callable] = {
    "Conv": _op_conv,
    "BatchNormalization": _op_batchnorm,
    "Gemm": _op_gemm,
    "Resize": _op_resize,
    "Upsample": _op_resize,
    "Relu": lambda env, n: jnp.maximum(env[n.inputs[0]], 0),
    "LeakyRelu": lambda env, n: jax.nn.leaky_relu(
        env[n.inputs[0]], n.attrs.get("alpha", 0.01)
    ),
    "PRelu": lambda env, n: jnp.where(
        env[n.inputs[0]] >= 0,
        env[n.inputs[0]],
        jnp.asarray(env[n.inputs[1]]).reshape(
            (1, -1) + (1,) * (env[n.inputs[0]].ndim - 2)
            if jnp.asarray(env[n.inputs[1]]).ndim == 1
            else jnp.asarray(env[n.inputs[1]]).shape
        )
        * env[n.inputs[0]],
    ),
    "Sigmoid": lambda env, n: jax.nn.sigmoid(env[n.inputs[0]]),
    "Softmax": lambda env, n: jax.nn.softmax(
        env[n.inputs[0]], axis=n.attrs.get("axis", -1)
    ),
    "Exp": lambda env, n: jnp.exp(env[n.inputs[0]]),
    "Sqrt": lambda env, n: jnp.sqrt(env[n.inputs[0]]),
    "Tanh": lambda env, n: jnp.tanh(env[n.inputs[0]]),
    "Clip": lambda env, n: jnp.clip(
        env[n.inputs[0]],
        n.attrs.get("min", env.get(n.inputs[1]) if len(n.inputs) > 1 and n.inputs[1] else None),
        n.attrs.get("max", env.get(n.inputs[2]) if len(n.inputs) > 2 and n.inputs[2] else None),
    ),
    "Add": _binop(np.add, jnp.add),
    "Sub": _binop(np.subtract, jnp.subtract),
    "Mul": _binop(np.multiply, jnp.multiply),
    "Div": _binop(np.divide, jnp.divide),
    "MatMul": lambda env, n: env[n.inputs[0]] @ jnp.asarray(env[n.inputs[1]]),
    "MaxPool": lambda env, n: _op_pool(env, n, jax.lax.max, -jnp.inf),
    "AveragePool": lambda env, n: _op_pool(env, n, jax.lax.add, 0.0, average=True),
    "GlobalAveragePool": lambda env, n: jnp.mean(
        env[n.inputs[0]], axis=tuple(range(2, env[n.inputs[0]].ndim)), keepdims=True
    ),
    "Concat": lambda env, n: (
        np.concatenate([env[i] for i in n.inputs], axis=n.attrs.get("axis", 0))
        if all(_is_static(env[i]) for i in n.inputs)
        else jnp.concatenate([jnp.asarray(env[i]) for i in n.inputs], axis=n.attrs.get("axis", 0))
    ),
    "Reshape": lambda env, n: jnp.reshape(
        env[n.inputs[0]],
        [int(v) for v in np.asarray(env[n.inputs[1]]).reshape(-1)],
    ),
    "Transpose": lambda env, n: jnp.transpose(
        env[n.inputs[0]], n.attrs.get("perm")
    ),
    "Flatten": lambda env, n: jnp.reshape(
        env[n.inputs[0]],
        (int(np.prod(env[n.inputs[0]].shape[: n.attrs.get("axis", 1)])), -1),
    ),
    "Identity": lambda env, n: env[n.inputs[0]],
    "Dropout": lambda env, n: env[n.inputs[0]],
    "Cast": lambda env, n: (
        np.asarray(env[n.inputs[0]]).astype(_TENSOR_DTYPES[n.attrs["to"]])
        if _is_static(env[n.inputs[0]])
        else env[n.inputs[0]].astype(_TENSOR_DTYPES[n.attrs["to"]])
    ),
    "Shape": lambda env, n: np.asarray(env[n.inputs[0]].shape, np.int64),
    "Gather": lambda env, n: (
        np.take(np.asarray(env[n.inputs[0]]), np.asarray(env[n.inputs[1]]),
                axis=n.attrs.get("axis", 0))
        if _is_static(env[n.inputs[0]]) and _is_static(env[n.inputs[1]])
        else jnp.take(env[n.inputs[0]], jnp.asarray(env[n.inputs[1]]),
                      axis=n.attrs.get("axis", 0))
    ),
    "Unsqueeze": lambda env, n: (
        np.expand_dims(
            np.asarray(env[n.inputs[0]]),
            tuple(n.attrs.get("axes") or [int(v) for v in np.asarray(env[n.inputs[1]])]),
        )
        if _is_static(env[n.inputs[0]])
        else jnp.expand_dims(
            env[n.inputs[0]],
            tuple(n.attrs.get("axes") or [int(v) for v in np.asarray(env[n.inputs[1]])]),
        )
    ),
    "Squeeze": lambda env, n: (
        np.squeeze(
            np.asarray(env[n.inputs[0]]),
            tuple(n.attrs.get("axes") or ([int(v) for v in np.asarray(env[n.inputs[1]])] if len(n.inputs) > 1 else None) or ()) or None,
        )
        if _is_static(env[n.inputs[0]])
        else jnp.squeeze(
            env[n.inputs[0]],
            tuple(n.attrs.get("axes") or ([int(v) for v in np.asarray(env[n.inputs[1]])] if len(n.inputs) > 1 else ())),
        )
    ),
    "Constant": lambda env, n: n.attrs.get(
        "value", n.attrs.get("value_float", n.attrs.get("value_int"))
    ),
    "ConstantOfShape": lambda env, n: np.full(
        [int(v) for v in np.asarray(env[n.inputs[0]])],
        n.attrs["value"].reshape(-1)[0] if "value" in n.attrs else 0.0,
    ),
    "Slice": _op_slice,
    "Pad": _op_pad,
    "ReduceMean": lambda env, n: jnp.mean(
        env[n.inputs[0]],
        axis=_reduce_axes(env, n),
        keepdims=bool(n.attrs.get("keepdims", 1)),
    ),
    "GridSample": _op_grid_sample,
    "LayerNormalization": _op_layernorm,
    "Erf": lambda env, n: jax.lax.erf(env[n.inputs[0]]),
    "Neg": lambda env, n: -env[n.inputs[0]],
    "Pow": _binop(np.power, jnp.power),
    "Greater": _binop(np.greater, jnp.greater),
    "Less": _binop(np.less, jnp.less),
    "Equal": _binop(np.equal, jnp.equal),
    "Not": lambda env, n: ~env[n.inputs[0]],
    "And": _binop(np.logical_and, jnp.logical_and),
    "Or": _binop(np.logical_or, jnp.logical_or),
    "Where": lambda env, n: (
        np.where(env[n.inputs[0]], env[n.inputs[1]], env[n.inputs[2]])
        if all(_is_static(env[n.inputs[i]]) for i in range(3))
        else jnp.where(env[n.inputs[0]], env[n.inputs[1]], env[n.inputs[2]])
    ),
    "Expand": lambda env, n: jnp.broadcast_to(
        env[n.inputs[0]],
        np.broadcast_shapes(
            np.shape(env[n.inputs[0]]),
            tuple(int(v) for v in np.asarray(env[n.inputs[1]])),
        ),
    ),
    "Range": lambda env, n: np.arange(
        np.asarray(env[n.inputs[0]]).reshape(()),
        np.asarray(env[n.inputs[1]]).reshape(()),
        np.asarray(env[n.inputs[2]]).reshape(()),
    ),
    "ReduceSum": lambda env, n: jnp.sum(
        env[n.inputs[0]],
        axis=_reduce_axes(env, n),
        keepdims=bool(n.attrs.get("keepdims", 1)),
    ),
    "ReduceMax": lambda env, n: jnp.max(
        env[n.inputs[0]],
        axis=_reduce_axes(env, n),
        keepdims=bool(n.attrs.get("keepdims", 1)),
    ),
    "ReduceMin": lambda env, n: jnp.min(
        env[n.inputs[0]],
        axis=_reduce_axes(env, n),
        keepdims=bool(n.attrs.get("keepdims", 1)),
    ),
    "Max": _binop(np.maximum, jnp.maximum),
    "Min": _binop(np.minimum, jnp.minimum),
    "Floor": lambda env, n: jnp.floor(env[n.inputs[0]]),
    "Log": lambda env, n: jnp.log(env[n.inputs[0]]),
    "Split": None,  # handled specially (multi-output)
    "TopK": None,  # handled specially (multi-output)
}


class OnnxModule:
    """An imported ONNX graph as a pure JAX function.

    ``params`` holds every float initializer (the trainable/convertible
    weights); integer/shape constants are baked into the trace. Call as
    ``module(params, x)`` — jit/vmap/shard like any pure function.
    """

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        self.input_names = graph.input_names
        self.output_names = graph.output_names
        self.params: dict[str, np.ndarray] = {}
        self.constants: dict[str, np.ndarray] = {}
        for name, arr in graph.initializers.items():
            if arr.dtype in (np.float32, np.float16, np.float64):
                self.params[name] = np.asarray(arr)
            else:
                self.constants[name] = np.asarray(arr)
        unsupported = sorted(
            {n.op_type for n in graph.nodes}
            - set(_OPS)
            - {"Split"}
        )
        if unsupported:
            raise NotImplementedError(
                f"ONNX ops not supported by the JAX executor: {unsupported}"
            )

    def input_hw(self) -> tuple[int, int] | None:
        """Static (H, W) of the first graph input if the model declares one."""
        if not self.input_names:
            return None
        sh = self.graph.input_shapes.get(self.input_names[0]) or []
        if len(sh) == 4 and sh[2] > 0 and sh[3] > 0:
            return int(sh[2]), int(sh[3])
        return None

    def __call__(self, params: dict, *inputs):
        env: dict[str, Any] = {}
        env.update(self.constants)
        env.update(params)
        for name, x in zip(self.input_names, inputs):
            env[name] = x
        for node in self.graph.nodes:
            if node.op_type == "TopK":
                vals, idx = _op_topk(env, node)
                env[node.outputs[0]] = vals
                if len(node.outputs) > 1:
                    env[node.outputs[1]] = idx
                continue
            if node.op_type == "Split":
                x = env[node.inputs[0]]
                axis = node.attrs.get("axis", 0)
                splits = node.attrs.get("split")
                if splits is None and len(node.inputs) > 1 and node.inputs[1]:
                    splits = [int(v) for v in np.asarray(env[node.inputs[1]])]
                if splits is None:
                    parts = jnp.split(x, len(node.outputs), axis=axis)
                else:
                    parts = jnp.split(x, np.cumsum(splits)[:-1], axis=axis)
                for out_name, part in zip(node.outputs, parts):
                    env[out_name] = part
                continue
            fn = _OPS.get(node.op_type)
            if fn is None:
                raise NotImplementedError(f"ONNX op {node.op_type}")
            env[node.outputs[0]] = fn(env, node)
        return tuple(env[name] for name in self.output_names)


def import_onnx(path: str) -> OnnxModule:
    """Parse + wrap an ``.onnx`` file as a jittable :class:`OnnxModule`."""
    return OnnxModule(parse_onnx(path))
