"""Checkpoint conversion: torch state dicts -> flax variable trees.

SURVEY.md §7 hard part "checkpoint conversion": the reference consumes
ultralytics ``.pt`` (utils/yolo_wrapper.py:55) and Real-ESRGAN ``.pth``
(utils/enhancer.py:99-156) checkpoints. TPU hosts have no CUDA torch; this
module uses CPU torch only to unpickle, then maps named tensors into the flax
trees of models/yolov11.py and models/rrdbnet.py with strict shape checking
(OIHW->HWIO for convs, [out,in]->[in,out] for linears).

Notes:
  * Real-ESRGAN ``.pth`` files are plain state dicts (keys ``params_ema`` /
    ``params``) — fully supported.
  * ultralytics ``.pt`` pickles embed ultralytics classes; unpickling needs
    the ultralytics package. Where it isn't installed, pre-export with
    ``torch.save(ckpt['model'].state_dict(), 'sd.pt')`` and pass that; the
    name mapping here consumes the ``model.N.*`` state-dict namespace.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def _load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "params_ema" in obj:
        obj = obj["params_ema"]
    elif isinstance(obj, dict) and "params" in obj:
        obj = obj["params"]
    elif isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        obj = obj["model"].state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().float().cpu().numpy() for k, v in obj.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray, expect=None):
    node = tree
    for p in path[:-1]:
        node = node[p]
    if path[-1] not in node:
        raise KeyError(f"no flax param at {'/'.join(path)}")
    if expect is not None and tuple(node[path[-1]].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"flax {tuple(node[path[-1]].shape)} vs ckpt {tuple(value.shape)}"
        )
    node[path[-1]] = value


# ---------------------------------------------------------------- RRDBNet ---

def convert_rrdbnet_checkpoint(path_or_sd, cfg) -> dict:
    """Real-ESRGAN .pth -> {'params': ...} for models/rrdbnet.RRDBNet.

    basicsr naming: conv_first, body.{i}.rdb{j}.conv{k}, conv_body, conv_up1,
    conv_up2, conv_hr, conv_last — all plain convs with bias."""
    import jax
    import jax.numpy as jnp

    from facedet_tpu.models.rrdbnet import RRDBNet

    sd = path_or_sd if isinstance(path_or_sd, dict) else _load_torch_state_dict(path_or_sd)
    model = RRDBNet(cfg)
    m = max(cfg.scale, 2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4 * m, 4 * m, cfg.num_in_ch))
    )
    params = jax.tree.map(np.asarray, variables["params"])

    def put(flax_name: str, torch_name: str):
        _set(
            params,
            flax_name.split("/") + ["kernel"],
            _conv_kernel(sd[f"{torch_name}.weight"]),
            expect=True,
        )
        _set(params, flax_name.split("/") + ["bias"], sd[f"{torch_name}.bias"], expect=True)

    put("conv_first", "conv_first")
    for i in range(cfg.num_block):
        for j in (1, 2, 3):
            for k in (1, 2, 3, 4, 5):
                put(f"body{i}/rdb{j}/conv{k}", f"body.{i}.rdb{j}.conv{k}")
    put("conv_body", "conv_body")
    put("conv_up1", "conv_up1")
    put("conv_up2", "conv_up2")
    put("conv_hr", "conv_hr")
    put("conv_last", "conv_last")
    return {"params": jax.tree.map(jnp.asarray, params)}


# ---------------------------------------------------------------- YOLOv11 ---

# yolo11(-pose) yaml module index -> flax module path prefix
_YOLO_INDEX_MAP = {
    0: "backbone/stem",
    1: "backbone/down1",
    2: "backbone/c3k2_0",
    3: "backbone/down2",
    4: "backbone/c3k2_1",
    5: "backbone/down3",
    6: "backbone/c3k2_2",
    7: "backbone/down4",
    8: "backbone/c3k2_3",
    9: "backbone/sppf",
    10: "backbone/c2psa",
    13: "neck/up0",
    16: "neck/up1",
    17: "neck/down0",
    19: "neck/pan0",
    20: "neck/down1",
    22: "neck/pan1",
}


def _convert_convbn(params, bstats, flax_prefix: list[str], sd: dict, tprefix: str):
    _set(params, flax_prefix + ["conv", "kernel"], _conv_kernel(sd[f"{tprefix}.conv.weight"]), True)
    _set(params, flax_prefix + ["bn", "scale"], sd[f"{tprefix}.bn.weight"], True)
    _set(params, flax_prefix + ["bn", "bias"], sd[f"{tprefix}.bn.bias"], True)
    _set(bstats, flax_prefix + ["bn", "mean"], sd[f"{tprefix}.bn.running_mean"], True)
    _set(bstats, flax_prefix + ["bn", "var"], sd[f"{tprefix}.bn.running_var"], True)


def _convert_bottleneck(params, bstats, prefix, sd, tprefix):
    _convert_convbn(params, bstats, prefix + ["cv1"], sd, f"{tprefix}.cv1")
    _convert_convbn(params, bstats, prefix + ["cv2"], sd, f"{tprefix}.cv2")


def _convert_c3k(params, bstats, prefix, sd, tprefix):
    for cv in ("cv1", "cv2", "cv3"):
        _convert_convbn(params, bstats, prefix + [cv], sd, f"{tprefix}.{cv}")
    i = 0
    while f"{tprefix}.m.{i}.cv1.conv.weight" in sd:
        _convert_bottleneck(params, bstats, prefix + [f"m{i}"], sd, f"{tprefix}.m.{i}")
        i += 1


def _convert_c3k2(params, bstats, prefix, sd, tprefix):
    _convert_convbn(params, bstats, prefix + ["cv1"], sd, f"{tprefix}.cv1")
    _convert_convbn(params, bstats, prefix + ["cv2"], sd, f"{tprefix}.cv2")
    i = 0
    while True:
        if f"{tprefix}.m.{i}.cv3.conv.weight" in sd:  # C3k inner
            _convert_c3k(params, bstats, prefix + [f"m{i}"], sd, f"{tprefix}.m.{i}")
        elif f"{tprefix}.m.{i}.cv1.conv.weight" in sd:  # Bottleneck inner
            _convert_bottleneck(params, bstats, prefix + [f"m{i}"], sd, f"{tprefix}.m.{i}")
        else:
            break
        i += 1


def _convert_c2psa(params, bstats, prefix, sd, tprefix):
    _convert_convbn(params, bstats, prefix + ["cv1"], sd, f"{tprefix}.cv1")
    _convert_convbn(params, bstats, prefix + ["cv2"], sd, f"{tprefix}.cv2")
    i = 0
    while f"{tprefix}.m.{i}.attn.qkv.conv.weight" in sd:
        p = prefix + [f"m{i}"]
        t = f"{tprefix}.m.{i}"
        for ours, theirs in (
            ("attn/qkv", "attn.qkv"),
            ("attn/pe", "attn.pe"),
            ("attn/proj", "attn.proj"),
            ("ffn0", "ffn.0"),
            ("ffn1", "ffn.1"),
        ):
            _convert_convbn(params, bstats, p + ours.split("/"), sd, f"{t}.{theirs}")
        i += 1


def _convert_sppf(params, bstats, prefix, sd, tprefix):
    _convert_convbn(params, bstats, prefix + ["cv1"], sd, f"{tprefix}.cv1")
    _convert_convbn(params, bstats, prefix + ["cv2"], sd, f"{tprefix}.cv2")


def _convert_head(params, bstats, sd, tprefix: str, with_pose: bool):
    head = ["head"]
    for i in range(3):
        # box branch cv2.{i}: Conv, Conv, plain Conv2d
        _convert_convbn(params, bstats, head + [f"box{i}_0"], sd, f"{tprefix}.cv2.{i}.0")
        _convert_convbn(params, bstats, head + [f"box{i}_1"], sd, f"{tprefix}.cv2.{i}.1")
        _set(params, head + [f"box{i}_2", "kernel"], _conv_kernel(sd[f"{tprefix}.cv2.{i}.2.weight"]), True)
        _set(params, head + [f"box{i}_2", "bias"], sd[f"{tprefix}.cv2.{i}.2.bias"], True)
        # cls branch cv3.{i}: (DW+PW), (DW+PW), Conv2d
        _convert_convbn(params, bstats, head + [f"cls{i}_dw0"], sd, f"{tprefix}.cv3.{i}.0.0")
        _convert_convbn(params, bstats, head + [f"cls{i}_pw0"], sd, f"{tprefix}.cv3.{i}.0.1")
        _convert_convbn(params, bstats, head + [f"cls{i}_dw1"], sd, f"{tprefix}.cv3.{i}.1.0")
        _convert_convbn(params, bstats, head + [f"cls{i}_pw1"], sd, f"{tprefix}.cv3.{i}.1.1")
        _set(params, head + [f"cls{i}_out", "kernel"], _conv_kernel(sd[f"{tprefix}.cv3.{i}.2.weight"]), True)
        _set(params, head + [f"cls{i}_out", "bias"], sd[f"{tprefix}.cv3.{i}.2.bias"], True)
        if with_pose:
            _convert_convbn(params, bstats, head + [f"kpt{i}_0"], sd, f"{tprefix}.cv4.{i}.0")
            _convert_convbn(params, bstats, head + [f"kpt{i}_1"], sd, f"{tprefix}.cv4.{i}.1")
            _set(params, head + [f"kpt{i}_2", "kernel"], _conv_kernel(sd[f"{tprefix}.cv4.{i}.2.weight"]), True)
            _set(params, head + [f"kpt{i}_2", "bias"], sd[f"{tprefix}.cv4.{i}.2.bias"], True)


def convert_ultralytics_checkpoint(path_or_sd, cfg) -> tuple[dict, Optional[str]]:
    """ultralytics yolo11-pose checkpoint/state-dict -> flax variables.

    Accepts a path (.pt; needs unpickling support, see module docstring) or a
    ready state dict with ``model.N.*`` keys. Returns (variables, scale)."""
    import jax
    import jax.numpy as jnp

    from facedet_tpu.models.yolov11 import YoloV11

    sd = path_or_sd if isinstance(path_or_sd, dict) else _load_torch_state_dict(path_or_sd)
    # normalize "model.model.N" / "model.N" prefixes to "model.N"
    sd = {k[6:] if k.startswith("model.model.") else k: v for k, v in sd.items()}

    model = YoloV11(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params = jax.tree.map(np.asarray, variables["params"])
    bstats = jax.tree.map(np.asarray, variables["batch_stats"])

    head_idx = None
    for idx, prefix in _YOLO_INDEX_MAP.items():
        t = f"model.{idx}"
        p = prefix.split("/")
        if prefix.endswith(("stem", "down1", "down2", "down3", "down4")) or "/down" in prefix:
            _convert_convbn(params, bstats, p, sd, t)
        elif "c3k2" in prefix or "/up" in prefix or "/pan" in prefix:
            _convert_c3k2(params, bstats, p, sd, t)
        elif prefix.endswith("sppf"):
            _convert_sppf(params, bstats, p, sd, t)
        elif prefix.endswith("c2psa"):
            _convert_c2psa(params, bstats, p, sd, t)
    for idx in (23, 22, 21):  # head index depends on yaml; probe
        if f"model.{idx}.cv2.0.0.conv.weight" in sd:
            head_idx = idx
            break
    if head_idx is None:
        raise KeyError("could not locate detect head (model.N.cv2.0.0.conv.weight)")
    _convert_head(params, bstats, sd, f"model.{head_idx}", cfg.with_pose)

    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, bstats),
    }
    return variables, cfg.scale
