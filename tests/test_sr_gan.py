"""Adversarial SR fine-tune (train/sr_gan.py) — the Real-ESRGAN GAN arm."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from facedet_tpu.models.rrdbnet import RRDBConfig, RRDBNet
from facedet_tpu.train.sr_gan import PatchDiscriminator, make_sr_gan_staged_loop


def _setup(scale=2, hr=16, batch=2, n_staged=3):
    g = RRDBNet(RRDBConfig(scale=scale, num_block=1, num_feat=8))
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, hr // scale, hr // scale, 3)))
    d = PatchDiscriminator(base=8)
    dv = d.init(jax.random.PRNGKey(1), jnp.zeros((1, hr, hr, 3)))
    g_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
    rng = np.random.default_rng(0)
    lr_u8 = jnp.asarray(
        rng.integers(0, 256, (n_staged, batch, hr // scale, hr // scale, 3)),
        jnp.uint8,
    )
    hr_u8 = jnp.asarray(
        rng.integers(0, 256, (n_staged, batch, hr, hr, 3)), jnp.uint8
    )
    return g, gv, d, dv, g_tx, d_tx, lr_u8, hr_u8


def test_discriminator_shapes():
    d = PatchDiscriminator(base=8)
    dv = d.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    out = d.apply(dv, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 4, 4, 1)


def test_gan_staged_loop_steps_both_nets():
    g, gv, d, dv, g_tx, d_tx, lr_u8, hr_u8 = _setup()
    run = make_sr_gan_staged_loop(g, d, g_tx, d_tx, steps_per_dispatch=3)
    out = run(
        gv, gv, g_tx.init(gv), dv["params"], dv.get("batch_stats", {}),
        d_tx.init(dv["params"]), lr_u8, hr_u8, jnp.int32(0),
        jax.random.PRNGKey(2),
    )
    gv2, ema2, _gopt, dp2, _dstats, _dopt, metrics = out
    # losses at init: adv ~ log2, d ~ 2*log2 (untrained D outputs ~0 logits)
    assert 0.3 < float(metrics["adv"]) < 1.2
    assert 0.7 < float(metrics["d"]) < 2.5
    assert np.isfinite(float(metrics["pixel"]))
    # both nets actually moved
    g_delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(gv), jax.tree.leaves(gv2))
    )
    d_delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(dv["params"]), jax.tree.leaves(dp2))
    )
    assert g_delta > 0 and d_delta > 0
    # EMA shadow tracks G but is not identical after warmup steps
    e_delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(ema2), jax.tree.leaves(gv2))
    )
    assert e_delta > 0


def test_gan_loop_resumes_at_global_step():
    """start drives batch round-robin: two dispatches from start 0/3 consume
    all staged batches without reuse (loss trajectories differ from a
    restart at 0)."""
    g, gv, d, dv, g_tx, d_tx, lr_u8, hr_u8 = _setup()
    run = make_sr_gan_staged_loop(g, d, g_tx, d_tx, steps_per_dispatch=3,
                                  flip=False)
    args0 = (gv, gv, g_tx.init(gv), dv["params"], dv.get("batch_stats", {}),
             d_tx.init(dv["params"]))
    out1 = run(*args0, lr_u8, hr_u8, jnp.int32(0), jax.random.PRNGKey(2))
    out2 = run(*out1[:6], lr_u8, hr_u8, jnp.int32(3), jax.random.PRNGKey(2))
    m1, m2 = out1[-1], out2[-1]
    assert float(m1["pixel"]) != float(m2["pixel"])


def test_perceptual_feature_loss_from_golden_yolo():
    """LPIPS-style distance from the golden YOLO backbone: zero at identity,
    positive and differentiable for distinct images (VERDICT r4 #3)."""
    from facedet_tpu.train.perceptual import make_yolo_feature_loss

    loss = make_yolo_feature_loss()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    assert float(loss(a, a)) < 1e-6
    d_ab = float(loss(a, b))
    assert d_ab > 1e-4 and np.isfinite(d_ab)
    # blurred-vs-sharp must register (the perceptual term's whole job)
    blur = (a + jnp.roll(a, 1, 1) + jnp.roll(a, 1, 2) + jnp.roll(a, -1, 1)) / 4
    assert float(loss(a, blur)) > 1e-5
    g = jax.grad(lambda x: loss(x, b))(a)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_gan_loop_with_perceptual_term():
    g, gv, d, dv, g_tx, d_tx, lr_u8, hr_u8 = _setup()

    # a cheap stand-in extractor keeps the test fast; the real extractor is
    # covered by test_perceptual_feature_loss_from_golden_yolo
    def percep(a, b):
        return jnp.mean(jnp.square(a - b)) * 2.0

    run = make_sr_gan_staged_loop(
        g, d, g_tx, d_tx, steps_per_dispatch=2, percep_fn=percep,
        percep_weight=0.5,
    )
    out = run(
        gv, gv, g_tx.init(gv), dv["params"], dv.get("batch_stats", {}),
        d_tx.init(dv["params"]), lr_u8, hr_u8, jnp.int32(0),
        jax.random.PRNGKey(2),
    )
    metrics = out[-1]
    assert float(metrics["percep"]) > 0 and np.isfinite(float(metrics["percep"]))
