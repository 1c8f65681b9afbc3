"""Native TOPIQ/CFANet (models/topiq.py): converter golden parity against an
independent torch mirror, shape/layout checks, and the iqa.py preference
order (VERDICT r2 #7)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from facedet_tpu.models.topiq import (  # noqa: E402
    CFANet,
    TopiqConfig,
    convert_topiq_torch,
    create_topiq,
    topiq_score,
)

TINY = TopiqConfig(
    embed_dim=32, num_heads=2, num_attn_blocks=1, mlp_ratio=2.0,
    stage_channels=(8, 16, 32, 64), stage_depths=(1, 1, 1, 1),
)


def _torch_tiny():
    from tests.torch_topiq_ref import TorchCFANet

    torch.manual_seed(0)
    m = TorchCFANet(
        embed_dim=32, heads=2, num_attn_blocks=1, mlp_ratio=2.0,
        stage_channels=(8, 16, 32, 64), stage_depths=(1, 1, 1, 1),
    ).eval()
    # non-trivial BN stats so the running-average path is exercised
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.3)
            mod.running_var.uniform_(0.5, 1.5)
    return m


def test_converter_forward_parity_vs_torch_mirror():
    m = _torch_tiny()
    variables = convert_topiq_torch(m.state_dict(), TINY)
    flax_model = CFANet(TINY)
    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 64, 3), np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(flax_model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_full_size_structure_and_param_count():
    cfg = TopiqConfig()
    model = CFANet(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                           train=False)
    )
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"])
    )
    # ResNet50 trunk alone is ~23.5M; CFANet head adds attention + MLPs
    assert 24e6 < n_params < 40e6
    out_shape = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((3, 224, 224, 3)), train=False), shapes
    )
    assert out_shape.shape == (3,)


def test_topiq_score_api_and_range():
    model, variables = create_topiq(TINY, image_size=64)
    rng = np.random.default_rng(1)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    s = topiq_score(model, variables, img)
    assert isinstance(s, float) and 0.0 <= s <= 1.0
    batch = topiq_score(model, variables, rng.random((2, 64, 64, 3)).astype(np.float32))
    assert batch.shape == (2,)


def test_iqa_prefers_native_for_torch_checkpoint(tmp_path, monkeypatch):
    """eval/iqa.py routes .pt/.pth/.npz through the native CFANet."""
    import facedet_tpu.eval.iqa as iqa
    import facedet_tpu.models.topiq as topiq_mod

    m = _torch_tiny()
    path = tmp_path / "topiq_tiny.pth"
    torch.save(m.state_dict(), str(path))
    # default TopiqConfig() doesn't match the tiny checkpoint; patch it so the
    # routing test stays cheap
    monkeypatch.setattr(topiq_mod, "TopiqConfig", lambda: TINY)
    monkeypatch.setattr(iqa, "brisque", lambda *a, **k: pytest.fail(
        "native path must not fall through to the BRISQUE proxy"
    ))
    rng = np.random.default_rng(2)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    s = iqa.topiq_face(img, model_path=str(path))
    assert 0.0 <= s <= 1.0


def test_proxy_fallback_without_weights():
    from facedet_tpu.eval.iqa import topiq_face

    rng = np.random.default_rng(3)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    s = topiq_face(img)
    assert 0.0 <= s <= 1.0
