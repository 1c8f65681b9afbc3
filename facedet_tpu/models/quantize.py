"""Post-training int8 quantization for the ConvBnAct stack.

The round-3 device-compute campaign left conv compute as the serving ceiling
(BENCH.md: 3.59 ms/img of convs at ~25% MFU). ``tools/probe_int8_conv``
measured int8 conv at 1.6-3.6x bf16 through the axon remote-compile path
(555 TOP/s on the mid-network shape vs 155 TF/s bf16) — the MXU's int8 path
is real, so serving gets a quantized mode.

Design (TPU-first, zero module plumbing):

- **Detection by tree shape**: ``layers.ConvBnAct`` checks for a ``qkernel``
  param in its own scope; when present it runs the int8 path. The SAME flax
  model object serves both modes — which mode runs is a property of the
  variables tree, so jit caching, the fused pipeline, and the engine need no
  new flags.
- **Folded epilogue**: conv(x_q int8, W_q int8) accumulates int32 on the MXU
  (``preferred_element_type``), then ONE fused affine applies
  activation-scale x per-channel weight-scale x folded BatchNorm, plus the
  folded BN bias, then SiLU: ``y = silu(acc * oscale + obias)``. int32
  accumulation is exact (|products| <= 127^2 x 9 x 512 << 2^31).
- **Symmetric scales**: weights per-output-channel (absmax/127 over HWI),
  activations per-tensor from calibration (absmax/127 over representative
  tiles, captured by ``sow`` inside ConvBnAct under the "calib" collection).
- **Exclusions**: the detect/pose head (regression precision), depthwise
  convs (VPU-bound, kernel in-channel dim == 1), and the s2d early stack
  (stem/down1/c3k2_0 — ``yolo_s2d.s2d_early_forward`` reads their conv/bn
  subtrees directly and they are already the fast path).

The reference serves fp16 TensorRT-style through ultralytics/onnxruntime and
never ships int8; this is the rebuild exploiting the TPU's int8 MXU peak
instead (SURVEY §7's "exploit the MXU" directive).
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Trace-time flag: while True, ConvBnAct sows its input absmax into the
# "calib" collection (read via calibrate(); plain module global because
# calibration traces run single-threaded).
CALIBRATING = False

# Default exclusions (path prefixes, tuple-of-names form): the head keeps
# bf16 regression precision; the early stack is owned by yolo_s2d.
DEFAULT_EXCLUDE = (
    ("head",),
    ("backbone", "stem"),
    ("backbone", "down1"),
    ("backbone", "c3k2_0"),
)

BN_EPS = 1e-3  # layers.ConvBnAct's BatchNorm epsilon


def _is_cba_node(p: dict) -> bool:
    return (
        isinstance(p, dict)
        and isinstance(p.get("conv"), dict)
        and "kernel" in p["conv"]
        and isinstance(p.get("bn"), dict)
        and "scale" in p["bn"]
    )


def _excluded(path: tuple, exclude: Iterable[tuple]) -> bool:
    return any(path[: len(e)] == tuple(e) for e in exclude)


def calibrate(model, variables, batches: Iterable[jax.Array]) -> dict:
    """Run ``batches`` (preprocessed [B,H,W,3] in [0,1]) through the model
    with calibration sows enabled; returns {path_tuple: absmax float} of
    every ConvBnAct input. Uses the model's normal inference signature."""
    global CALIBRATING
    absmax: dict[tuple, float] = {}

    @jax.jit
    def fwd(v, x):
        _out, aux = model.apply(v, x, mutable=["calib"])
        return aux["calib"]

    CALIBRATING = True
    try:
        for x in batches:
            calib = jax.device_get(fwd(variables, jnp.asarray(x)))
            flat = jax.tree_util.tree_flatten_with_path(calib)[0]
            for kp, val in flat:
                # key path ... DictKey(module), DictKey('absmax'); sow wraps
                # values in a tuple -> SequenceKey tail
                names = tuple(
                    k.key for k in kp if isinstance(k, jax.tree_util.DictKey)
                )[:-1]
                v = float(np.max(val))
                absmax[names] = max(absmax.get(names, 0.0), v)
    finally:
        CALIBRATING = False
    return absmax


def quantize_variables(
    variables: dict,
    act_absmax: dict,
    exclude: Iterable[tuple] = DEFAULT_EXCLUDE,
    predicate: Optional[Callable[[tuple, np.ndarray], bool]] = None,
) -> dict:
    """Convert a trained {params, batch_stats} tree into the int8 serving
    tree: each non-excluded ConvBnAct scope's ``conv/kernel`` becomes
    ``qkernel`` (int8, per-channel symmetric) and its BatchNorm folds into
    ``oscale``/``obias`` (f32, per-channel); ``ascale`` carries the
    calibrated input scale. Depthwise kernels (in-channel dim 1) and scopes
    without a calibration record stay unquantized. ``predicate(path,
    kernel)`` can veto additional scopes."""
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))
    n_q = 0

    def convert_cba(node: dict, bn_stats: dict, path: tuple):
        kernel = np.asarray(node["conv"]["kernel"], np.float32)
        wmax = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12)
        wscale = wmax / 127.0
        qkernel = np.clip(np.round(kernel / wscale), -127, 127).astype(np.int8)
        ascale = np.float32(act_absmax[path] / 127.0)
        bn_p = node["bn"]
        g = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
            np.asarray(bn_stats["var"], np.float32) + BN_EPS
        )
        b = np.asarray(bn_p["bias"], np.float32) - np.asarray(
            bn_stats["mean"], np.float32
        ) * g
        return {
            "qkernel": qkernel,
            "ascale": ascale,
            "oscale": (ascale * wscale * g).astype(np.float32),
            "obias": b.astype(np.float32),
        }

    def quantizable(node: dict, path: tuple) -> bool:
        kernel = np.asarray(node["conv"]["kernel"])
        return (
            not _excluded(path, exclude)
            and kernel.shape[2] > 1  # skip depthwise
            and path in act_absmax
            and act_absmax[path] > 0
            and (predicate is None or predicate(path, kernel))
        )

    if _is_cba_node(params):  # bare ConvBnAct module (tests, probes)
        if not quantizable(params, ()):
            raise ValueError("no ConvBnAct scope was quantized — check calibration paths")
        out = dict(variables)
        out["params"] = convert_cba(params, stats["bn"], ())
        out["batch_stats"] = {}
        return out

    def walk(p: dict, s: dict, path: tuple):
        nonlocal n_q
        out_p, out_s = {}, {}
        for name, node in p.items():
            sub_s = s.get(name, {}) if isinstance(s, dict) else {}
            cur = path + (name,)
            if _is_cba_node(node):
                if quantizable(node, cur):
                    out_p[name] = convert_cba(node, sub_s["bn"], cur)
                    n_q += 1
                    continue  # bn folded: no batch_stats entry
                out_p[name] = node
                if sub_s:
                    out_s[name] = sub_s
            elif isinstance(node, dict):
                rp, rs = walk(node, sub_s, cur)
                out_p[name] = rp
                if rs:
                    out_s[name] = rs
            else:
                out_p[name] = node
                if isinstance(s, dict) and name in s:
                    out_s[name] = s[name]
        return out_p, out_s

    new_p, new_s = walk(params, stats, ())
    if n_q == 0:
        raise ValueError("no ConvBnAct scope was quantized — check calibration paths")
    out = dict(variables)
    out["params"] = new_p
    out["batch_stats"] = new_s
    return out


def quantize_detector(det, calib_images=None, n_calib: int = 4) -> int:
    """Quantize a loaded detector in place: calibrate on ``calib_images``
    (uint8 HWC list; synthetic natural-statistics tiles when None), convert
    ``det.variables``, and drop any cached jit/resident state so the next
    dispatch compiles the int8 graph. Returns the quantized-conv count."""
    import jax

    if getattr(det, "variables", None) is None:
        det.load_model()
    model, variables = det.model, det.variables
    size = int(getattr(det, "image_size", 640))
    if calib_images is None:
        calib_images = [_natural_tile(size, seed=i) for i in range(n_calib)]
    batches = []
    for im in calib_images:
        x = np.asarray(im, np.float32) / 255.0
        if x.shape[0] != size or x.shape[1] != size:
            y = np.zeros((size, size, 3), np.float32)
            y[: min(size, x.shape[0]), : min(size, x.shape[1])] = x[
                :size, :size
            ]
            x = y
        batches.append(x[None])
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        absmax = calibrate(model, variables, batches)
        qvars = quantize_variables(variables, absmax)
    n = sum(1 for _ in _iter_q(qvars["params"]))
    det.variables = qvars
    # engine caches key on id(model)/id(variables); new tree -> new uploads
    return n


def _iter_q(p: dict, path=()):
    for name, node in p.items():
        if isinstance(node, dict):
            if "qkernel" in node:
                yield path + (name,)
            else:
                yield from _iter_q(node, path + (name,))


def _natural_tile(size: int, seed: int = 0) -> np.ndarray:
    """Multi-scale smooth-noise tile (the bench generator's texture) — a
    stand-in calibration input with natural image statistics."""
    rng = np.random.default_rng(seed)
    base = np.zeros((size, size, 3), np.float32)
    for octave in (8, 32, 128):
        up = np.kron(
            rng.standard_normal((octave, octave, 3)).astype(np.float32),
            np.ones((size // octave, size // octave, 1), np.float32),
        )
        base += up * (1.0 / octave) ** 0.35
    base -= base.min()
    base *= 255.0 / max(base.max(), 1e-6)
    return base.astype(np.uint8)
