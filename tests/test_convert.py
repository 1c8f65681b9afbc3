import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facedet_tpu.models.convert import (
    _conv_kernel,
    convert_rrdbnet_checkpoint,
    convert_ultralytics_checkpoint,
)
from facedet_tpu.models.rrdbnet import RRDBConfig, RRDBNet
from facedet_tpu.models.yolov11 import YoloConfig, YoloV11


def test_rrdb_converter_roundtrip():
    cfg = RRDBConfig(num_feat=8, num_block=2, num_grow_ch=4, scale=4)
    # build a synthetic basicsr-style state dict with correct shapes
    model = RRDBNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    rng = np.random.default_rng(0)

    def torch_key(flax_path):
        # body0/rdb1/conv2 -> body.0.rdb1.conv2 ; conv_first -> conv_first
        parts = flax_path.split("/")
        out = []
        for p in parts:
            if p.startswith("body"):
                out.append(f"body.{p[4:]}")
            else:
                out.append(p)
        return ".".join(out)

    sd = {}
    expected = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                name = torch_key("/".join(path))
                arr = rng.normal(size=v.shape).astype(np.float32)
                if k == "kernel":
                    sd[f"{name}.weight"] = np.transpose(arr, (3, 2, 0, 1))
                else:
                    sd[f"{name}.bias"] = arr
                expected["/".join(path + [k])] = arr

    walk(jax.tree.map(np.asarray, variables["params"]), [])
    out = convert_rrdbnet_checkpoint(sd, cfg)

    flat = {}

    def flatten(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, path + [k])
            else:
                flat["/".join(path + [k])] = np.asarray(v)

    flatten(out["params"], [])
    assert set(flat) == set(expected)
    for k in expected:
        np.testing.assert_allclose(flat[k], expected[k], atol=1e-6, err_msg=k)


_IDX = {
    "stem": 0, "down1": 1, "c3k2_0": 2, "down2": 3, "c3k2_1": 4, "down3": 5,
    "c3k2_2": 6, "down4": 7, "c3k2_3": 8, "sppf": 9, "c2psa": 10,
}
_NECK_IDX = {"up0": 13, "up1": 16, "down0": 17, "pan0": 19, "down1": 20, "pan1": 22}
_HEAD = 23


def _torch_key_yolo(path, leaf, collection):
    """Inverse of the converter's name mapping, written independently."""
    part0 = path[0]
    if part0 == "backbone":
        base = f"model.{_IDX[path[1]]}"
        inner = path[2:]
    elif part0 == "neck":
        base = f"model.{_NECK_IDX[path[1]]}"
        inner = path[2:]
    else:  # head
        name = path[1]
        if name.startswith("box"):
            i, stage = name[3], name[5]
            base = f"model.{_HEAD}.cv2.{i}.{stage}"
        elif name.startswith("cls"):
            i = name[3]
            sub = name[5:]
            sub_map = {"dw0": "0.0", "pw0": "0.1", "dw1": "1.0", "pw1": "1.1", "out": "2"}
            base = f"model.{_HEAD}.cv3.{i}.{sub_map[sub]}"
        else:  # kpt
            i, stage = name[3], name[5]
            base = f"model.{_HEAD}.cv4.{i}.{stage}"
        inner = path[2:]
    toks = []
    for p in inner:
        if p.startswith("m") and p[1:].isdigit():
            toks.append(f"m.{p[1:]}")
        elif p in ("attn", "qkv", "pe", "proj"):
            toks.append(p)
        elif p == "ffn0":
            toks.append("ffn.0")
        elif p == "ffn1":
            toks.append("ffn.1")
        elif p in ("conv", "bn"):
            toks.append(p)
        else:
            toks.append(p)
    base = ".".join([base] + toks)
    if collection == "batch_stats":
        return f"{base}.running_mean" if leaf == "mean" else f"{base}.running_var"
    if leaf == "kernel":
        return f"{base}.weight"
    if leaf == "scale":
        return f"{base}.weight"
    return f"{base}.bias"


def test_yolo_converter_roundtrip():
    cfg = YoloConfig(scale="n", num_classes=1, with_pose=True)
    model = YoloV11(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(1)
    sd, expected = {}, {}

    def harvest(tree, collection):
        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + [k])
                else:
                    key = _torch_key_yolo(path, k, collection)
                    arr = rng.normal(size=v.shape).astype(np.float32)
                    if k == "kernel":
                        sd[key] = np.transpose(arr, (3, 2, 0, 1))
                    else:
                        sd[key] = arr
                    expected[(collection, "/".join(path + [k]))] = arr

        walk(jax.tree.map(np.asarray, tree), [])

    harvest(variables["params"], "params")
    harvest(variables["batch_stats"], "batch_stats")

    out, scale = convert_ultralytics_checkpoint(sd, cfg)
    assert scale == "n"

    flat = {}

    def flatten(node, path, coll):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, path + [k], coll)
            else:
                flat[(coll, "/".join(path + [k]))] = np.asarray(v)

    flatten(out["params"], [], "params")
    flatten(out["batch_stats"], [], "batch_stats")
    assert set(flat) == set(expected)
    mismatches = [k for k in expected if not np.allclose(flat[k], expected[k], atol=1e-6)]
    assert not mismatches, mismatches[:10]


def test_converter_rejects_bad_shapes():
    cfg = RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=4)
    with pytest.raises((KeyError, ValueError)):
        convert_rrdbnet_checkpoint({"conv_first.weight": np.zeros((1, 1, 1, 1))}, cfg)


# ------------------------------------------------------------------------
# Golden-activation parity vs torch (SURVEY.md §7 "checkpoint conversion ...
# golden activation tests per block"; reference utils/yolo_wrapper.py:55
# consumes the same architecture through the ultralytics package).
# ------------------------------------------------------------------------

torch = pytest.importorskip("torch")


def _flax_apply(module, variables, x_nchw):
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    out = module.apply(variables, x, train=False)
    return out


def _convert_block(flax_module, torch_block, x_shape, convert_fn):
    """Init flax block, map the torch block's weights in via convert_fn,
    return (flax vars, torch sd)."""
    sd = {f"blk.{k}": v.detach().numpy() for k, v in torch_block.state_dict().items()}
    variables = flax_module.init(
        jax.random.PRNGKey(0), jnp.zeros((x_shape[0], x_shape[2], x_shape[3], x_shape[1])),
        train=False,
    )
    params = jax.tree.map(np.asarray, variables["params"])
    bstats = jax.tree.map(np.asarray, variables["batch_stats"])
    convert_fn(params, bstats, [], sd, "blk")
    return {"params": params, "batch_stats": bstats}


def _golden_block(flax_module, torch_block, c_in, convert_fn, hw=16, atol=2e-5):
    from torch_yolo_ref import randomize_

    randomize_(torch_block, seed=11)
    x = np.random.default_rng(3).standard_normal((2, c_in, hw, hw)).astype(np.float32)
    with torch.no_grad():
        want = torch_block(torch.as_tensor(x)).numpy()
    variables = _convert_block(flax_module, torch_block, x.shape, convert_fn)
    got = np.transpose(np.asarray(_flax_apply(flax_module, variables, x)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_golden_convbnact():
    from facedet_tpu.models import convert as C
    from facedet_tpu.models.layers import ConvBnAct
    from torch_yolo_ref import Conv as TConv

    def conv_fn(params, bstats, prefix, sd, t):
        C._convert_convbn(params, bstats, prefix, sd, t)

    _golden_block(ConvBnAct(12, kernel=3, stride=2), TConv(5, 12, 3, 2), 5, conv_fn)


def test_golden_c3k2_bottleneck_and_c3k():
    from facedet_tpu.models import convert as C
    from facedet_tpu.models.layers import C3k2
    from torch_yolo_ref import C3k2 as TC3k2

    _golden_block(
        C3k2(16, n=2, c3k=False, expansion=0.25),
        TC3k2(8, 16, n=2, c3k=False, e=0.25),
        8,
        C._convert_c3k2,
    )
    _golden_block(
        C3k2(16, n=1, c3k=True), TC3k2(16, 16, n=1, c3k=True), 16, C._convert_c3k2
    )


def test_golden_sppf():
    from facedet_tpu.models import convert as C
    from facedet_tpu.models.layers import SPPF
    from torch_yolo_ref import SPPF as TSPPF

    _golden_block(SPPF(16), TSPPF(16, 16), 16, C._convert_sppf)


def test_golden_c2psa():
    from facedet_tpu.models import convert as C
    from facedet_tpu.models.layers import C2PSA
    from torch_yolo_ref import C2PSA as TC2PSA

    _golden_block(
        C2PSA(128, n=1), TC2PSA(128, 128, n=1), 128, C._convert_c2psa, hw=8, atol=5e-5
    )


def test_golden_full_model_and_head():
    """End-to-end converter parity: random torch yolo11n-pose (ultralytics
    state-dict naming) -> convert_ultralytics_checkpoint -> flax forward ==
    torch forward on all 9 raw head maps."""
    from torch_yolo_ref import TorchYolo11Pose, randomize_

    cfg = YoloConfig(scale="n", num_classes=1, with_pose=True, dtype="float32")
    tnet = randomize_(TorchYolo11Pose(cfg), seed=5)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables, scale = convert_ultralytics_checkpoint(sd, cfg)
    assert scale == "n"

    x = np.random.default_rng(9).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.as_tensor(x))
    model = YoloV11(cfg)
    outs = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    for lvl, (w_box, w_cls, w_kpt) in enumerate(want):
        got = outs[lvl]
        np.testing.assert_allclose(
            np.transpose(np.asarray(got["box"]), (0, 3, 1, 2)), w_box.numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"box level {lvl}",
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got["cls"]), (0, 3, 1, 2)), w_cls.numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"cls level {lvl}",
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got["kpt"]), (0, 3, 1, 2)), w_kpt.numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"kpt level {lvl}",
        )
