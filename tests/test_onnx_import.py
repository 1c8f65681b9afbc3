"""Differential tests for the ONNX->JAX importer.

Golden semantics come from torch itself: each case builds a torch module,
exports it to ONNX with the legacy TorchScript serializer (which writes the
protobuf in C++ and therefore works without the `onnx` pip package), runs the
torch forward for reference activations, then imports the file with
facedet_tpu.models.onnx_import and compares outputs to <=1e-4.

This is the validation path for loading insightface SCRFD/RetinaFace
pretrained .onnx checkpoints on TPU (reference:
utils/insightface_wrapper.py:38-44 runs them through onnxruntime-gpu).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from facedet_tpu.models.onnx_import import import_onnx, parse_onnx  # noqa: E402


def export_onnx(module, args, path, opset=11):
    """torch.onnx.export without the python onnx package: the post-export
    onnxscript merge step is the only part needing `onnx`; skip it."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto
    try:
        torch.onnx.export(module.eval(), args, path, opset_version=opset, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def roundtrip(module, x, tmp_path, opset=11, atol=1e-4):
    path = str(tmp_path / "m.onnx")
    export_onnx(module, torch.as_tensor(x), path, opset=opset)
    with torch.no_grad():
        ref = module(torch.as_tensor(x))
    refs = [r.numpy() for r in (ref if isinstance(ref, (tuple, list)) else [ref])]
    mod = import_onnx(path)
    outs = mod(mod.params, x)
    assert len(outs) == len(refs)
    for got, want in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-4)
    return mod


def test_conv_bn_relu_sigmoid(tmp_path):
    class Tiny(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.c2 = nn.Conv2d(8, 4, 1)

        def forward(self, x):
            return torch.sigmoid(self.c2(torch.relu(self.bn(self.c1(x)))))

    torch.manual_seed(0)
    m = Tiny()
    # non-trivial running stats so BatchNormalization folding is exercised
    m.bn.running_mean.normal_()
    m.bn.running_var.uniform_(0.5, 2.0)
    x = np.random.default_rng(0).standard_normal((1, 3, 32, 32), np.float32)
    mod = roundtrip(m, x, tmp_path)
    assert mod.params  # weights surfaced as a params pytree


def test_residual_pool_gemm(tmp_path):
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 8, 3, padding=1)
            self.c2 = nn.Conv2d(8, 8, 3, padding=1)
            self.pool = nn.MaxPool2d(2, 2)
            self.fc = nn.Linear(8 * 8 * 8, 5)

        def forward(self, x):
            y = torch.relu(self.c1(x))
            y = torch.relu(self.c2(y) + y)  # residual Add
            y = self.pool(y)
            return self.fc(torch.flatten(y, 1))

    torch.manual_seed(1)
    x = np.random.default_rng(1).standard_normal((1, 3, 16, 16), np.float32)
    roundtrip(Net(), x, tmp_path)


def test_depthwise_and_leaky(tmp_path):
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.dw = nn.Conv2d(6, 6, 3, padding=1, groups=6)
            self.pw = nn.Conv2d(6, 4, 1)
            self.act = nn.LeakyReLU(0.1)

        def forward(self, x):
            return self.act(self.pw(self.dw(x)))

    torch.manual_seed(2)
    x = np.random.default_rng(2).standard_normal((1, 6, 12, 12), np.float32)
    roundtrip(Net(), x, tmp_path)


class MicroScrfd(nn.Module):
    """Structural miniature of insightface's SCRFD graph: strided backbone,
    FPN top-down with nearest Upsample + Add, shared head emitting
    score/bbox/kps per stride, flattened per-level via Reshape/Transpose —
    the op pattern the real checkpoints contain."""

    def __init__(self, c=8, anchors=2, kps=5):
        super().__init__()
        self.anchors, self.kps = anchors, kps
        self.stem = nn.Conv2d(3, c, 3, stride=2, padding=1)
        self.s8 = nn.Conv2d(c, c, 3, stride=4, padding=1)
        self.s16 = nn.Conv2d(c, c, 3, stride=2, padding=1)
        self.s32 = nn.Conv2d(c, c, 3, stride=2, padding=1)
        self.lat8 = nn.Conv2d(c, c, 1)
        self.lat16 = nn.Conv2d(c, c, 1)
        self.cls = nn.Conv2d(c, anchors, 1)
        self.box = nn.Conv2d(c, anchors * 4, 1)
        self.kp = nn.Conv2d(c, anchors * kps * 2, 1)

    def forward(self, x):
        x = torch.relu(self.stem(x))
        f8 = torch.relu(self.s8(x))
        f16 = torch.relu(self.s16(f8))
        f32 = torch.relu(self.s32(f16))
        p16 = self.lat16(f16) + nn.functional.interpolate(f32, scale_factor=2, mode="nearest")
        p8 = self.lat8(f8) + nn.functional.interpolate(p16, scale_factor=2, mode="nearest")
        outs = []
        for f in (p8, p16, f32):
            n = f.shape[0]
            outs.append(torch.sigmoid(self.cls(f)).permute(0, 2, 3, 1).reshape(n, -1, 1))
        for f in (p8, p16, f32):
            n = f.shape[0]
            outs.append(self.box(f).permute(0, 2, 3, 1).reshape(n, -1, 4))
        for f in (p8, p16, f32):
            n = f.shape[0]
            outs.append(self.kp(f).permute(0, 2, 3, 1).reshape(n, -1, self.kps * 2))
        return tuple(outs)


def test_micro_scrfd_graph(tmp_path):
    torch.manual_seed(3)
    m = MicroScrfd()
    x = np.random.default_rng(3).standard_normal((1, 3, 64, 64), np.float32)
    mod = roundtrip(m, x, tmp_path)
    assert len(mod.output_names) == 9  # score/bbox/kps x 3 strides


def test_jit_and_vmap_over_tiles(tmp_path):
    import jax
    import jax.numpy as jnp

    torch.manual_seed(4)
    m = MicroScrfd()
    path = str(tmp_path / "s.onnx")
    export_onnx(m, torch.randn(1, 3, 64, 64), path)
    mod = import_onnx(path)

    tiles = np.random.default_rng(4).standard_normal((3, 1, 3, 64, 64), np.float32)
    fn = jax.jit(jax.vmap(lambda t: mod(mod.params, t)))
    outs = fn(jnp.asarray(tiles))
    assert outs[0].shape[0] == 3
    with torch.no_grad():
        want = m(torch.as_tensor(tiles[1]))[0].numpy()
    np.testing.assert_allclose(np.asarray(outs[0][1]), want, atol=1e-4, rtol=1e-4)


def test_parse_reports_shapes_and_graph(tmp_path):
    torch.manual_seed(5)
    export_onnx(MicroScrfd(), torch.randn(1, 3, 64, 64), str(tmp_path / "g.onnx"))
    g = parse_onnx(str(tmp_path / "g.onnx"))
    assert g.input_names and g.output_names
    assert g.input_shapes[g.input_names[0]][1:] == [3, 64, 64]
    ops = {n.op_type for n in g.nodes}
    assert {"Conv", "Relu", "Add", "Sigmoid"} <= ops
    mod = import_onnx(str(tmp_path / "g.onnx"))
    assert mod.input_hw() == (64, 64)


def test_grid_sample_topk_layernorm(tmp_path):
    """The op trio ultralytics RT-DETR exports lean on: deformable-attention
    GridSample, top-k query selection, LayerNormalization."""

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln = nn.LayerNorm(6)

        def forward(self, x):
            n, c, h, w = x.shape
            ys = torch.linspace(-0.9, 0.9, 5)
            xs = torch.linspace(-0.9, 0.9, 6)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            grid = torch.stack([gx, gy], -1)[None].expand(n, -1, -1, -1)
            s = torch.nn.functional.grid_sample(
                x, grid, mode="bilinear", padding_mode="zeros", align_corners=False
            )  # [n, c, 5, 6]
            s = self.ln(s.flatten(2).transpose(1, 2).reshape(n, 5 * c, 6))
            vals, idx = torch.topk(s, k=3, dim=1)
            return vals, idx.float()

    torch.manual_seed(8)
    m = Net().eval()
    x = np.random.default_rng(8).standard_normal((2, 4, 9, 11), np.float32)
    path = str(tmp_path / "ops16.onnx")
    export_onnx(m, torch.as_tensor(x), path, opset=16)
    with torch.no_grad():
        want = [t.numpy() for t in m(torch.as_tensor(x))]
    mod = import_onnx(path)
    got = mod(mod.params, x)
    np.testing.assert_allclose(np.asarray(got[0]), want[0], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), want[1], atol=1e-4)


def test_grid_sample_padding_and_align_variants(tmp_path):
    class Net(nn.Module):
        def __init__(self, mode, padding, align):
            super().__init__()
            self.mode, self.padding, self.align = mode, padding, align

        def forward(self, x):
            n = x.shape[0]
            # grid partly out of bounds to exercise padding behaviour
            ys = torch.linspace(-1.4, 1.4, 4)
            xs = torch.linspace(-1.4, 1.4, 5)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            grid = torch.stack([gx, gy], -1)[None].expand(n, -1, -1, -1)
            return torch.nn.functional.grid_sample(
                x, grid, mode=self.mode, padding_mode=self.padding,
                align_corners=self.align,
            )

    x = np.random.default_rng(9).standard_normal((1, 3, 7, 8), np.float32)
    for mode, padding, align in [
        ("bilinear", "zeros", False),
        ("bilinear", "border", True),
        ("nearest", "zeros", True),
    ]:
        m = Net(mode, padding, align).eval()
        path = str(tmp_path / f"gs_{mode}_{padding}_{align}.onnx")
        export_onnx(m, torch.as_tensor(x), path, opset=16)
        with torch.no_grad():
            want = m(torch.as_tensor(x)).numpy()
        mod = import_onnx(path)
        got = np.asarray(mod(mod.params, x)[0])
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"{mode}/{padding}/{align}")
