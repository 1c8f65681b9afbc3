"""JAX -> ONNX exporter: serialize jitted forwards as real ``.onnx`` files.

The reference ecosystem interchanges models as exported graphs (ultralytics
``model.export(format="onnx")``; insightface ships SCRFD as ``.onnx`` consumed
through onnxruntime — utils/insightface_wrapper.py:38-44). This module closes
the loop in the other direction for the TPU framework:

  1. a dependency-free protobuf *wire format* encoder (the mirror of
     models/onnx_import.py's decoder; same frozen field numbers), and
  2. a generic jaxpr -> ONNX graph converter: ``jax.make_jaxpr`` traces the
     flax forward once (the same static-shape contract XLA compiles under) and
     each primitive lowers to standard ONNX ops. NHWC convs wrap in
     Transposes; single-use transposed weight initializers are folded so the
     file carries real OIHW layouts like torch exports do.

Model-level helpers emit the two layouts the engine's import paths consume:
``export_scrfd_onnx`` (insightface SCRFD layout: NCHW blob input, flattened
per-level score/bbox/kps outputs — engine/scrfd_wrapper.py) and
``export_yolo_onnx`` (ultralytics export head ``[B, 4+nc+K*3, A]`` —
engine/onnx_wrapper.py). Round-trip tests re-import these through
models/onnx_import.py and assert parity with the native flax forward at full
architecture scale.
"""
from __future__ import annotations

import struct
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend.core import Literal

__all__ = [
    "serialize_model",
    "save_onnx",
    "export_jax_to_onnx",
    "export_scrfd_onnx",
    "export_yolo_onnx",
]

# ---------------------------------------------------------------------------
# protobuf wire-format encoding (mirror of onnx_import's decoder)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_int(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(int(v))


def _f_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _f_str(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode())


def _f_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", float(v))


_NP_TO_ONNX_DTYPE = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.uint16): 4, np.dtype(np.int16): 5, np.dtype(np.int32): 6,
    np.dtype(np.int64): 7, np.dtype(np.bool_): 9, np.dtype(np.float16): 10,
    np.dtype(np.float64): 11, np.dtype(np.uint32): 12, np.dtype(np.uint64): 13,
}


def encode_tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto: dims(1), data_type(2), name(8), raw_data(9)."""
    arr = np.ascontiguousarray(arr)
    code = _NP_TO_ONNX_DTYPE.get(arr.dtype)
    if code is None:
        raise ValueError(f"initializer {name!r}: unsupported dtype {arr.dtype}")
    out = b"".join(_f_int(1, d) for d in arr.shape)
    out += _f_int(2, code)
    out += _f_str(8, name)
    out += _f_bytes(9, arr.tobytes())
    return out


def encode_attribute(name: str, value: Any) -> bytes:
    """AttributeProto with the explicit type field (20) modern exporters set."""
    out = _f_str(1, name)
    if isinstance(value, bool):
        out += _f_int(20, 2) + _f_int(3, int(value))
    elif isinstance(value, int):
        out += _f_int(20, 2) + _f_int(3, value)
    elif isinstance(value, float):
        out += _f_int(20, 1) + _f_float(2, value)
    elif isinstance(value, str):
        out += _f_int(20, 3) + _f_bytes(4, value.encode())
    elif isinstance(value, np.ndarray):
        out += _f_int(20, 4) + _f_bytes(5, encode_tensor("", value))
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            out += _f_int(20, 6) + b"".join(_f_float(7, v) for v in value)
        else:
            out += _f_int(20, 7) + b"".join(_f_int(8, int(v)) for v in value)
    else:
        raise ValueError(f"attribute {name!r}: unsupported value {value!r}")
    return out


def encode_node(op_type: str, inputs, outputs, attrs: dict, name: str = "") -> bytes:
    out = b"".join(_f_str(1, i) for i in inputs)
    out += b"".join(_f_str(2, o) for o in outputs)
    if name:
        out += _f_str(3, name)
    out += _f_str(4, op_type)
    out += b"".join(_f_bytes(5, encode_attribute(k, v)) for k, v in attrs.items())
    return out


def encode_value_info(name: str, shape, elem_type: int = 1) -> bytes:
    dims = b"".join(_f_bytes(1, _f_int(1, d)) for d in shape)
    tensor_type = _f_int(1, elem_type) + _f_bytes(2, dims)
    type_proto = _f_bytes(1, tensor_type)
    return _f_str(1, name) + _f_bytes(2, type_proto)


def serialize_model(graph, opset: int = 17, ir_version: int = 8,
                    producer: str = "facedet_tpu") -> bytes:
    """Serialize an onnx_import.OnnxGraph-shaped object (with node attrs and
    numpy initializers) into ModelProto bytes."""
    g = b"".join(
        _f_bytes(1, encode_node(n.op_type, n.inputs, n.outputs, n.attrs, n.name))
        for n in graph.nodes
    )
    g += _f_str(2, graph.name or "facedet_tpu_graph")
    g += b"".join(
        _f_bytes(5, encode_tensor(nm, np.asarray(arr)))
        for nm, arr in graph.initializers.items()
    )
    for nm in graph.input_names:
        shape = graph.input_shapes.get(nm, [])
        g += _f_bytes(11, encode_value_info(nm, shape))
    for nm in graph.output_names:
        g += _f_bytes(12, encode_value_info(nm, []))
    model = _f_int(1, ir_version)
    model += _f_str(3, producer)
    model += _f_bytes(7, g)
    model += _f_bytes(8, _f_str(1, "") + _f_int(2, opset))  # opset_import
    return model


def save_onnx(graph, path: str, opset: int = 17) -> None:
    with open(path, "wb") as fh:
        fh.write(serialize_model(graph, opset=opset))


# ---------------------------------------------------------------------------
# jaxpr -> ONNX graph
# ---------------------------------------------------------------------------


class _Builder:
    def __init__(self):
        from facedet_tpu.models.onnx_import import OnnxNode

        self._Node = OnnxNode
        self.nodes: list = []
        self.initializers: dict[str, np.ndarray] = {}
        self._n = 0

    def name(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def init(self, arr, hint: str = "const") -> str:
        nm = self.name(hint)
        self.initializers[nm] = np.asarray(arr)
        return nm

    def node(self, op: str, inputs, n_out: int = 1, **attrs):
        outs = [self.name(op.lower()) for _ in range(n_out)]
        self.nodes.append(
            self._Node(op_type=op, inputs=list(inputs), outputs=outs,
                       attrs=attrs, name=self.name(f"n_{op}"))
        )
        return outs[0] if n_out == 1 else outs


def _aval_np_dtype(v) -> np.dtype:
    return np.dtype(v.aval.dtype)


def _lower_conv(gb: _Builder, env, eqn):
    lhs, rhs = eqn.invars
    p = eqn.params
    dn = p["dimension_numbers"]
    if p["batch_group_count"] != 1:
        raise NotImplementedError("batch_group_count != 1")
    if any(d != 1 for d in p["lhs_dilation"]):
        raise NotImplementedError("transposed conv export")
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    # lhs -> NCHW
    x = gb.node("Transpose", [env[lhs]], perm=list(lhs_spec))
    # rhs -> OIHW
    w = gb.node("Transpose", [env[rhs]], perm=list(rhs_spec))
    pads = list(p["padding"])
    spatial = len(pads)
    out = gb.node(
        "Conv", [x, w],
        strides=[int(s) for s in p["window_strides"]],
        pads=[int(pads[i][0]) for i in range(spatial)]
        + [int(pads[i][1]) for i in range(spatial)],
        dilations=[int(d) for d in p["rhs_dilation"]],
        group=int(p["feature_group_count"]),
    )
    # NCHW -> out_spec order: out_spec[i] says where result dim i of the
    # canonical (N, C, *spatial) tensor lands; invert it
    inv = [0] * len(out_spec)
    for canon_pos, out_pos in enumerate(out_spec):
        inv[out_pos] = canon_pos
    env[eqn.outvars[0]] = gb.node("Transpose", [out], perm=inv)


def _lower_dot_general(gb: _Builder, env, eqn):
    lhs, rhs = eqn.invars
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lshape, rshape = lhs.aval.shape, rhs.aval.shape
    lfree = [i for i in range(len(lshape)) if i not in lc and i not in lb]
    rfree = [i for i in range(len(rshape)) if i not in rc and i not in rb]
    bdim = int(np.prod([lshape[i] for i in lb])) if lb else 1
    m = int(np.prod([lshape[i] for i in lfree])) if lfree else 1
    k = int(np.prod([lshape[i] for i in lc])) if lc else 1
    n = int(np.prod([rshape[i] for i in rfree])) if rfree else 1

    a = gb.node("Transpose", [env[lhs]], perm=list(lb) + lfree + list(lc))
    a = gb.node("Reshape", [a, gb.init(np.asarray([bdim, m, k], np.int64), "shape")])
    b = gb.node("Transpose", [env[rhs]], perm=list(rb) + list(rc) + rfree)
    b = gb.node("Reshape", [b, gb.init(np.asarray([bdim, k, n], np.int64), "shape")])
    out = gb.node("MatMul", [a, b])
    out_shape = (
        [lshape[i] for i in lb] + [lshape[i] for i in lfree] + [rshape[i] for i in rfree]
    )
    env[eqn.outvars[0]] = gb.node(
        "Reshape", [out, gb.init(np.asarray(out_shape or [1], np.int64), "shape")]
    )


def _lower_reduce_window_max(gb: _Builder, env, eqn):
    p = eqn.params
    dims = p["window_dimensions"]
    strides = p["window_strides"]
    pads = p["padding"]
    if any(d != 1 for d in p.get("base_dilation", (1,) * len(dims))) or any(
        d != 1 for d in p.get("window_dilation", (1,) * len(dims))
    ):
        raise NotImplementedError("dilated pooling export")
    # NHWC spatial pooling (flax nn.max_pool): window (1, k, k, 1)
    if len(dims) != 4 or dims[0] != 1 or dims[3] != 1:
        raise NotImplementedError(f"unsupported pooling window {dims}")
    x = gb.node("Transpose", [env[eqn.invars[0]]], perm=[0, 3, 1, 2])
    out = gb.node(
        "MaxPool", [x],
        kernel_shape=[int(dims[1]), int(dims[2])],
        strides=[int(strides[1]), int(strides[2])],
        pads=[int(pads[1][0]), int(pads[2][0]), int(pads[1][1]), int(pads[2][1])],
    )
    env[eqn.outvars[0]] = gb.node("Transpose", [out], perm=[0, 2, 3, 1])


def _lower_broadcast_in_dim(gb: _Builder, env, eqn):
    p = eqn.params
    shape = [int(s) for s in p["shape"]]
    bdims = p["broadcast_dimensions"]
    x = env[eqn.invars[0]]
    in_shape = eqn.invars[0].aval.shape
    # reshape to rank(target) with 1s in the new dims
    mid = [1] * len(shape)
    for src, dst in enumerate(bdims):
        mid[dst] = int(in_shape[src])
    if list(in_shape) != mid:
        x = gb.node("Reshape", [x, gb.init(np.asarray(mid or [1], np.int64), "shape")])
    if mid != shape:
        x = gb.node("Expand", [x, gb.init(np.asarray(shape, np.int64), "shape")])
    env[eqn.outvars[0]] = x


def _lower_slice(gb: _Builder, env, eqn):
    p = eqn.params
    starts = [int(s) for s in p["start_indices"]]
    ends = [int(s) for s in p["limit_indices"]]
    steps = [int(s) for s in (p["strides"] or [1] * len(starts))]
    env[eqn.outvars[0]] = gb.node(
        "Slice",
        [
            env[eqn.invars[0]],
            gb.init(np.asarray(starts, np.int64), "starts"),
            gb.init(np.asarray(ends, np.int64), "ends"),
            gb.init(np.asarray(list(range(len(starts))), np.int64), "axes"),
            gb.init(np.asarray(steps, np.int64), "steps"),
        ],
    )


def _lower_split(gb: _Builder, env, eqn):
    """jax ``split`` (multi-output) -> one Slice per part."""
    axis = int(eqn.params["axis"])
    sizes = [int(s) for s in eqn.params["sizes"]]
    x = env[eqn.invars[0]]
    off = 0
    for ov, sz in zip(eqn.outvars, sizes):
        env[ov] = gb.node(
            "Slice",
            [
                x,
                gb.init(np.asarray([off], np.int64), "starts"),
                gb.init(np.asarray([off + sz], np.int64), "ends"),
                gb.init(np.asarray([axis], np.int64), "axes"),
            ],
        )
        off += sz


def _lower_pad(gb: _Builder, env, eqn):
    p = eqn.params["padding_config"]
    if any(cfg[2] != 0 for cfg in p):
        raise NotImplementedError("interior padding export")
    if any(cfg[0] < 0 or cfg[1] < 0 for cfg in p):
        raise NotImplementedError("negative padding export")
    pads = [int(c[0]) for c in p] + [int(c[1]) for c in p]
    env[eqn.outvars[0]] = gb.node(
        "Pad",
        [
            env[eqn.invars[0]],
            gb.init(np.asarray(pads, np.int64), "pads"),
            env[eqn.invars[1]],  # constant value (scalar operand of lax.pad)
        ],
        mode="constant",
    )


def _simple(op: str) -> Callable:
    def h(gb, env, eqn):
        env[eqn.outvars[0]] = gb.node(op, [env[v] for v in eqn.invars])

    return h


def _lower_reduce(op: str, axes_as_input: bool = False) -> Callable:
    """ReduceSum-13 moved `axes` from attribute to (optional) second input;
    at the emitted opset 17 an axes ATTRIBUTE on ReduceSum is invalid for
    external runtimes (onnxruntime/onnx.checker reject it). ReduceMax/Min
    keep the attribute form until opset 18."""

    def h(gb, env, eqn):
        axes = [int(a) for a in eqn.params["axes"]]
        if axes_as_input:
            env[eqn.outvars[0]] = gb.node(
                op,
                [env[eqn.invars[0]], gb.init(np.asarray(axes, np.int64), "axes")],
                keepdims=0,
            )
        else:
            env[eqn.outvars[0]] = gb.node(
                op, [env[eqn.invars[0]]], axes=axes, keepdims=0
            )

    return h


_ONNX_CAST_CODE = _NP_TO_ONNX_DTYPE


def _lower_convert(gb, env, eqn):
    to = np.dtype(eqn.params["new_dtype"])
    code = _ONNX_CAST_CODE.get(to)
    if code is None:
        raise NotImplementedError(f"cast to {to}")
    env[eqn.outvars[0]] = gb.node("Cast", [env[eqn.invars[0]]], to=code)


def _lower_max(gb, env, eqn):
    # relu shows up as max(x, 0): emit the idiomatic node real exports carry
    x, y = eqn.invars
    for a, b in ((x, y), (y, x)):
        if isinstance(b, Literal) and np.all(np.asarray(b.val) == 0):
            env[eqn.outvars[0]] = gb.node("Relu", [env[a]])
            return
    env[eqn.outvars[0]] = gb.node("Max", [env[x], env[y]])


def _lower_rsqrt(gb, env, eqn):
    s = gb.node("Sqrt", [env[eqn.invars[0]]])
    one = gb.init(np.asarray(1.0, _aval_np_dtype(eqn.invars[0])), "one")
    env[eqn.outvars[0]] = gb.node("Div", [one, s])


def _lower_square(gb, env, eqn):
    x = env[eqn.invars[0]]
    env[eqn.outvars[0]] = gb.node("Mul", [x, x])


def _lower_integer_pow(gb, env, eqn):
    y = float(eqn.params["y"])
    p = gb.init(np.asarray(y, _aval_np_dtype(eqn.invars[0])), "pow")
    env[eqn.outvars[0]] = gb.node("Pow", [env[eqn.invars[0]], p])


def _lower_iota(gb, env, eqn):
    p = eqn.params
    shape = tuple(int(s) for s in p["shape"])
    arr = np.broadcast_to(
        np.arange(shape[p["dimension"]], dtype=np.dtype(p["dtype"])).reshape(
            [-1 if i == p["dimension"] else 1 for i in range(len(shape))]
        ),
        shape,
    ).copy()
    env[eqn.outvars[0]] = gb.init(arr, "iota")


def _lower_select_n(gb, env, eqn):
    pred, c0, c1 = eqn.invars
    if np.dtype(pred.aval.dtype) != np.bool_:
        raise NotImplementedError("select_n with integer predicate")
    env[eqn.outvars[0]] = gb.node("Where", [env[pred], env[c1], env[c0]])


def _lower_gather(gb, env, eqn):
    """Constrained gather: static integer indexing along one axis (the
    ``x[..., i]`` pattern jnp indexing traces to) -> Slice + Reshape."""
    operand, idx = eqn.invars
    if not isinstance(idx, Literal):
        raise NotImplementedError("gather with traced indices")
    dn = eqn.params["dimension_numbers"]
    slice_sizes = eqn.params["slice_sizes"]
    if len(dn.start_index_map) != 1:
        raise NotImplementedError(f"gather start_index_map {dn.start_index_map}")
    axis = dn.start_index_map[0]
    shape = operand.aval.shape
    if any(
        s != (1 if d == axis else shape[d]) for d, s in enumerate(slice_sizes)
    ):
        raise NotImplementedError(f"gather slice_sizes {slice_sizes}")
    i = int(np.asarray(idx.val).reshape(-1)[0])
    if i < 0:
        i += shape[axis]
    sl = gb.node(
        "Slice",
        [
            env[operand],
            gb.init(np.asarray([i], np.int64), "starts"),
            gb.init(np.asarray([i + 1], np.int64), "ends"),
            gb.init(np.asarray([axis], np.int64), "axes"),
        ],
    )
    out_shape = list(eqn.outvars[0].aval.shape)
    env[eqn.outvars[0]] = gb.node(
        "Reshape", [sl, gb.init(np.asarray(out_shape or [1], np.int64), "shape")]
    )


def _lower_reshape(gb, env, eqn):
    if eqn.params.get("dimensions") is not None:
        raise NotImplementedError("reshape with dimension permutation")
    shape = [int(s) for s in eqn.params["new_sizes"]]
    env[eqn.outvars[0]] = gb.node(
        "Reshape",
        [env[eqn.invars[0]], gb.init(np.asarray(shape or [1], np.int64), "shape")],
    )


def _lower_concat(gb, env, eqn):
    env[eqn.outvars[0]] = gb.node(
        "Concat", [env[v] for v in eqn.invars], axis=int(eqn.params["dimension"])
    )


def _lower_transpose(gb, env, eqn):
    env[eqn.outvars[0]] = gb.node(
        "Transpose", [env[eqn.invars[0]]],
        perm=[int(p) for p in eqn.params["permutation"]],
    )


def _lower_squeeze(gb, env, eqn):
    shape = list(eqn.outvars[0].aval.shape)
    env[eqn.outvars[0]] = gb.node(
        "Reshape",
        [env[eqn.invars[0]], gb.init(np.asarray(shape or [1], np.int64), "shape")],
    )


_HANDLERS: dict[str, Callable] = {
    "add": _simple("Add"),
    "sub": _simple("Sub"),
    "mul": _simple("Mul"),
    "div": _simple("Div"),
    "max": _lower_max,
    "min": _simple("Min"),
    "neg": _simple("Neg"),
    "exp": _simple("Exp"),
    "log": _simple("Log"),
    "tanh": _simple("Tanh"),
    "sqrt": _simple("Sqrt"),
    "erf": _simple("Erf"),
    "floor": _simple("Floor"),
    "logistic": _simple("Sigmoid"),
    "lt": _simple("Less"),
    "gt": _simple("Greater"),
    "eq": _simple("Equal"),
    "pow": _simple("Pow"),
    "rsqrt": _lower_rsqrt,
    "square": _lower_square,
    "integer_pow": _lower_integer_pow,
    "convert_element_type": _lower_convert,
    "conv_general_dilated": _lower_conv,
    "dot_general": _lower_dot_general,
    "reduce_window_max": _lower_reduce_window_max,
    "reduce_sum": _lower_reduce("ReduceSum", axes_as_input=True),
    "reduce_max": _lower_reduce("ReduceMax"),
    "reduce_min": _lower_reduce("ReduceMin"),
    "broadcast_in_dim": _lower_broadcast_in_dim,
    "reshape": _lower_reshape,
    "squeeze": _lower_squeeze,
    "concatenate": _lower_concat,
    "transpose": _lower_transpose,
    "slice": _lower_slice,
    "split": _lower_split,
    "gather": _lower_gather,
    "pad": _lower_pad,
    "iota": _lower_iota,
    "select_n": _lower_select_n,
    "stop_gradient": _simple("Identity"),
    "copy": _simple("Identity"),
}

_INLINE_CALLS = {"pjit", "jit", "closed_call", "core_call", "remat", "checkpoint"}


class _Env:
    """Var -> ONNX name map; Literals (unhashable) materialize as
    initializers on access."""

    def __init__(self, gb: _Builder, d: dict):
        self.gb, self.d = gb, d

    def __getitem__(self, v):
        if isinstance(v, Literal):
            return self.gb.init(np.asarray(v.val), "lit")
        return self.d[v]

    def __setitem__(self, v, nm):
        self.d[v] = nm


def _walk_jaxpr(gb: _Builder, jaxpr, env_dict: dict):
    env = _Env(gb, env_dict) if isinstance(env_dict, dict) else env_dict
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _INLINE_CALLS:
            inner = eqn.params["jaxpr"]
            inner_jaxpr = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            consts = getattr(inner, "consts", [])
            inner_env = dict(
                zip(inner_jaxpr.invars, [env[v] for v in eqn.invars])
            )
            for cv, c in zip(inner_jaxpr.constvars, consts):
                inner_env[cv] = gb.init(np.asarray(c), "const")
            _walk_jaxpr(gb, inner_jaxpr, inner_env)
            for outer, inner_v in zip(eqn.outvars, inner_jaxpr.outvars):
                if isinstance(inner_v, Literal):
                    env[outer] = gb.init(np.asarray(inner_v.val), "lit")
                else:
                    env[outer] = inner_env[inner_v]
            continue
        if name in ("custom_jvp_call", "custom_vjp_call", "custom_vjp_call_jaxpr"):
            inner = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
            inner_jaxpr = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            consts = getattr(inner, "consts", [])
            inner_env = dict(zip(inner_jaxpr.invars, [env[v] for v in eqn.invars]))
            for cv, c in zip(inner_jaxpr.constvars, consts):
                inner_env[cv] = gb.init(np.asarray(c), "const")
            _walk_jaxpr(gb, inner_jaxpr, inner_env)
            for outer, inner_v in zip(eqn.outvars, inner_jaxpr.outvars):
                if isinstance(inner_v, Literal):
                    env[outer] = gb.init(np.asarray(inner_v.val), "lit")
                else:
                    env[outer] = inner_env[inner_v]
            continue
        handler = _HANDLERS.get(name)
        if handler is None:
            raise NotImplementedError(
                f"no ONNX lowering for jax primitive {name!r} "
                f"(shapes {[v.aval.shape for v in eqn.invars]})"
            )
        handler(gb, env, eqn)


def _fold_single_use_transposes(graph):
    """Fold ``Transpose(initializer)`` into the initializer when that node is
    its only consumer — conv weights then live in the file as OIHW arrays,
    matching real torch-exported layouts."""
    uses: dict[str, int] = {}
    for n in graph.nodes:
        for i in n.inputs:
            uses[i] = uses.get(i, 0) + 1
    out_names = set(graph.output_names)
    kept = []
    for n in graph.nodes:
        if (
            n.op_type == "Transpose"
            and n.inputs[0] in graph.initializers
            and uses.get(n.inputs[0], 0) == 1
            and n.outputs[0] not in out_names
        ):
            arr = graph.initializers.pop(n.inputs[0])
            graph.initializers[n.outputs[0]] = np.ascontiguousarray(
                np.transpose(arr, n.attrs["perm"])
            )
            continue
        kept.append(n)
    graph.nodes = kept
    return graph


def export_jax_to_onnx(
    fn: Callable,
    params,
    x: jnp.ndarray,
    path: Optional[str] = None,
    *,
    input_name: str = "input.1",
    output_names: Optional[list[str]] = None,
    param_names: Optional[dict] = None,
    graph_name: str = "facedet_tpu",
    opset: int = 17,
):
    """Trace ``fn(params, x)`` with make_jaxpr and lower to an ONNX graph.

    ``params`` (a pytree of arrays) become graph initializers named by their
    flattened pytree paths; ``x`` becomes the single graph input. Returns the
    OnnxGraph (and writes ``path`` when given).
    """
    from facedet_tpu.models.onnx_import import OnnxGraph

    flat, treedef = jax.tree_util.tree_flatten(params)
    paths = [
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]

    def wrapper(flat_params, xx):
        return fn(jax.tree_util.tree_unflatten(treedef, flat_params), xx)

    closed = jax.make_jaxpr(wrapper)(flat, x)
    jaxpr = closed.jaxpr

    gb = _Builder()
    env: dict = {}
    invars = jaxpr.invars
    n_params = len(flat)
    for var, arr, pname in zip(invars[:n_params], flat, paths):
        nm = pname or gb.name("param")
        if nm in gb.initializers:
            nm = gb.name(pname)
        gb.initializers[nm] = np.asarray(arr)
        env[var] = nm
    env[invars[n_params]] = input_name
    for cv, c in zip(jaxpr.constvars, closed.consts):
        env[cv] = gb.init(np.asarray(c), "const")

    _walk_jaxpr(gb, jaxpr, env)

    outs = []
    for ov in jaxpr.outvars:
        nm = env[ov] if not isinstance(ov, Literal) else gb.init(
            np.asarray(ov.val), "lit"
        )
        # graph outputs must be node outputs, not raw initializers
        outs.append(gb.node("Identity", [nm]) if nm in gb.initializers else nm)
    # rename outputs to the requested names
    if output_names:
        rename = dict(zip(outs, output_names))
        for n in gb.nodes:
            n.inputs = [rename.get(i, i) for i in n.inputs]
            n.outputs = [rename.get(o, o) for o in n.outputs]
        outs = [rename.get(o, o) for o in outs]

    graph = OnnxGraph(
        nodes=gb.nodes,
        initializers=gb.initializers,
        input_names=[input_name],
        output_names=outs,
        input_shapes={input_name: [int(s) for s in x.shape]},
        name=graph_name,
    )
    graph = _fold_single_use_transposes(graph)
    if path:
        save_onnx(graph, path, opset=opset)
    return graph


# ---------------------------------------------------------------------------
# model-level exports
# ---------------------------------------------------------------------------


def export_scrfd_onnx(cfg, variables, image_size: int = 640,
                      path: Optional[str] = None):
    """Export a native flax SCRFD as an insightface-layout ``.onnx``: NCHW
    blob input ``(pix*255-127.5)/128``, outputs score_8..32 (sigmoided),
    bbox_8..32, kps_8..32 flattened ``[B, h*w*A, c]`` anchor-fastest — exactly
    what engine/scrfd_wrapper.py's ONNX path (and insightface's own runtime,
    utils/insightface_wrapper.py:38-44) consume."""
    from facedet_tpu.models.scrfd import STRIDES, Scrfd

    model = Scrfd(cfg)

    def fwd(params, blob):
        x = jnp.transpose(blob, (0, 2, 3, 1))
        x = (x * 128.0 + 127.5) / 255.0  # inverse of the in-model normalize
        levels = model.apply(params, x, train=False)
        outs = []
        b = blob.shape[0]
        for key in ("cls", "box", "kps"):
            for lvl in levels:
                c = {"cls": 1, "box": 4, "kps": 2 * cfg.num_keypoints}[key]
                flat = lvl[key].reshape(b, -1, c)
                outs.append(jax.nn.sigmoid(flat) if key == "cls" else flat)
        return tuple(outs)

    names = [f"{k}_{s}" for k in ("score", "bbox", "kps") for s in STRIDES]
    blob = jnp.zeros((1, 3, image_size, image_size), jnp.float32)
    return export_jax_to_onnx(
        fwd, variables, blob, path,
        input_name="input.1", output_names=names, graph_name="scrfd",
    )


def export_yolo_onnx(cfg, variables, image_size: int = 640,
                     path: Optional[str] = None):
    """Export a native flax YOLOv11(-pose) with the ultralytics export head:
    float32 [0,1] RGB NCHW input -> ``[B, 4+nc+K*3, A]`` (cxcywh pixel boxes,
    sigmoided class scores, decoded keypoint triples) — the layout
    engine/onnx_wrapper.py auto-detects as ``yolo``."""
    from facedet_tpu.models.yolo_decode import decode_predictions
    from facedet_tpu.models.yolov11 import YoloV11

    model = YoloV11(cfg)

    def fwd(params, x_nchw):
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        levels = model.apply(params, x, train=False)
        preds = decode_predictions(levels)
        x1, y1, x2, y2 = jnp.split(preds["boxes"], 4, -1)
        cxcywh = jnp.concatenate(
            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1
        )
        parts = [cxcywh, preds["scores"]]
        if "kpts" in preds:
            k = preds["kpts"]
            parts.append(k.reshape(k.shape[0], k.shape[1], -1))
        feats = jnp.concatenate(parts, -1)  # [B, A, C]
        return jnp.transpose(feats, (0, 2, 1))

    x = jnp.zeros((1, 3, image_size, image_size), jnp.float32)
    return export_jax_to_onnx(
        fwd, variables, x, path,
        input_name="images", output_names=["output0"], graph_name="yolov11",
    )
