import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.models.rtdetr import (
    RTDETR_VARIANTS,
    RtDetrConfig,
    create_rtdetr,
    decode_rtdetr,
    sincos_pos_embed_2d,
)

TINY = RTDETR_VARIANTS["rtdetr-tiny"]


@pytest.fixture(scope="module")
def tiny():
    return create_rtdetr(TINY, jax.random.PRNGKey(0), image_size=64)


def test_pos_embed():
    pe = sincos_pos_embed_2d(4, 6, 64)
    assert pe.shape == (24, 64)
    assert np.isfinite(np.asarray(pe)).all()


def test_forward_shapes(tiny):
    model, variables = tiny
    outs = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert len(outs["logits"]) == TINY.num_decoder_layers
    assert outs["logits"][-1].shape == (2, TINY.num_queries, 1)
    assert outs["boxes"][-1].shape == (2, TINY.num_queries, 4)
    b = np.asarray(outs["boxes"][-1])
    assert (b >= 0).all() and (b <= 1).all()  # normalized cxcywh


def test_decode(tiny):
    model, variables = tiny
    outs = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    preds = decode_rtdetr(outs, image_size=64)
    assert preds["boxes"].shape == (1, TINY.num_queries, 4)
    assert preds["scores"].shape == (1, TINY.num_queries, 1)


def test_hungarian_matcher():
    from facedet_tpu.train.rtdetr_train import hungarian_match

    cost = jnp.array([[[0.1, 5.0], [5.0, 0.2], [1.0, 1.0]]])  # [1, Q=3, M=2]
    assign = np.asarray(hungarian_match(cost))
    assert assign.shape == (1, 2)
    assert assign[0, 0] == 0 and assign[0, 1] == 1


def test_loss_and_train_step(tiny):
    from facedet_tpu.train.rtdetr_train import make_rtdetr_train_step, rtdetr_loss
    import optax

    model, variables = tiny
    images = jnp.zeros((2, 64, 64, 3))
    gt_boxes = jnp.tile(jnp.array([[[0.5, 0.5, 0.2, 0.3]]]), (2, 3, 1))
    gt_mask = jnp.array([[True, True, False], [True, False, False]])
    outs = model.apply(variables, images, train=False)
    total, parts = rtdetr_loss(outs, gt_boxes, gt_mask)
    assert np.isfinite(float(total))
    assert set(parts) == {"cls", "l1", "giou"}

    tx = optax.adamw(2e-3)
    step = make_rtdetr_train_step(model, tx, dn_groups=2)
    params, bs = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(8):
        rng, key = jax.random.split(rng)
        params, bs, opt_state, loss, parts = step(
            params, bs, opt_state, images, gt_boxes, gt_mask, key
        )
        losses.append(float(loss))
    assert "dn" in parts  # CDN loss active
    assert all(np.isfinite(l) for l in losses)
    # DETR losses are jumpy step-to-step (Hungarian reassignment); compare
    # the mean of the last quarter against the first step
    assert np.mean(losses[-2:]) < losses[0], losses


def test_wrapper_sliced_compatible():
    from facedet_tpu.engine.rtdetr_wrapper import RtDetrDetectionModel
    from facedet_tpu.engine.predict import get_sliced_prediction

    model = RtDetrDetectionModel(
        variant="rtdetr-tiny", dtype="float32", confidence_threshold=0.99, image_size=64
    )
    img = np.zeros((100, 120, 3), np.uint8)
    result = get_sliced_prediction(
        img, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    assert result.detections is not None  # runs through the fused engine


def test_trainer_checkpoints(tmp_path, tiny):
    from facedet_tpu.train.rtdetr_train import RtDetrTrainer

    trainer = RtDetrTrainer(TINY, output_dir=str(tmp_path), image_size=64, save_period=1)
    images = jnp.zeros((1, 64, 64, 3))
    gt_boxes = jnp.array([[[0.5, 0.5, 0.2, 0.2]]])
    gt_mask = jnp.ones((1, 1), bool)
    out = trainer.fit(lambda e: [(images, gt_boxes, gt_mask)], num_epochs=2, verbose=False)
    assert out["epochs"] == 2
    assert (tmp_path / "best.npz").exists()
    assert (tmp_path / "last.npz").exists()
    assert (tmp_path / "results.csv").read_text().startswith("epoch,")


def test_trainer_validate(tmp_path, tiny):
    from facedet_tpu.train.rtdetr_train import RtDetrTrainer

    trainer = RtDetrTrainer(TINY, output_dir=str(tmp_path), image_size=64)
    img = np.zeros((64, 64, 3), np.uint8)
    dataset = [{"file_name": "a.jpg", "image_id": 1, "gt": [[10, 10, 20, 20]]}]
    out = trainer.validate(dataset, lambda _: img)
    assert set(out) >= {"map", "map50", "map75"}


def test_greedy_match_agrees_with_hungarian_when_separated():
    from facedet_tpu.train.rtdetr_train import greedy_match, hungarian_match

    # well-separated costs: greedy == hungarian
    cost = jnp.array([[[0.1, 9.0, 9.0], [9.0, 0.2, 9.0], [9.0, 9.0, 0.3], [5.0, 5.0, 5.0]]])
    g = np.asarray(greedy_match(cost))
    h = np.asarray(hungarian_match(cost))
    np.testing.assert_array_equal(g, h)
    assert list(g[0]) == [0, 1, 2]


def test_build_cdn_layout_and_noise():
    from facedet_tpu.train.rtdetr_train import build_cdn

    gt = jnp.tile(jnp.array([[[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]]]), (2, 1, 1))
    mask = jnp.array([[True, True], [True, False]])
    labels, ref, pos_valid = build_cdn(
        jax.random.PRNGKey(0), gt, mask, num_groups=3, num_classes=1
    )
    n = 3 * 2 * 2  # groups * (pos+neg) * M
    assert labels.shape == (2, n) and ref.shape == (2, n, 4)
    # group-major layout: first M are positives of group 0
    assert bool(pos_valid[0, 0]) and bool(pos_valid[0, 1])
    assert not bool(pos_valid[0, 2]) and not bool(pos_valid[0, 3])  # negatives
    # invalid GT slot -> background label, not a positive
    assert int(labels[1, 1]) == 1 and not bool(pos_valid[1, 1])
    # positive noise is bounded by the box extent; negatives pushed further
    lab = np.asarray(labels)
    r = np.asarray(ref)
    d0 = np.abs(r[0, 0, :2] - np.array([0.5, 0.5]))
    assert (d0 <= np.array([0.1, 0.1]) + 1e-6).all()  # pos center within w/2
    d_neg = np.abs(r[0, 2, :2] - np.array([0.5, 0.5]))
    assert (d_neg >= np.array([0.1, 0.1]) - 1e-6).all()  # neg center beyond w/2
    # everything stays a valid normalized box
    assert (r[..., 2:] > 0).all() and (r[..., :2] >= 0).all() and (r[..., :2] <= 1).all()


def test_dn_attention_mask_blocks_leakage():
    from facedet_tpu.models.rtdetr import dn_attention_mask

    m = np.asarray(dn_attention_mask(n_dn=4, num_groups=2, num_queries=3))
    assert m.shape == (7, 7)
    assert m[4:, 4:].all()            # matching <-> matching
    assert not m[4:, :4].any()        # matching never sees dn
    assert m[:4, 4:].all()            # dn sees matching
    assert m[0, 1] and not m[0, 2]    # same group yes, other group no


def test_forward_with_dn_queries(tiny):
    model, variables = tiny
    images = jnp.zeros((1, 64, 64, 3))
    gt = jnp.array([[[0.5, 0.5, 0.2, 0.2]]])
    mask = jnp.ones((1, 1), bool)
    from facedet_tpu.train.rtdetr_train import build_cdn

    labels, ref, _ = build_cdn(jax.random.PRNGKey(1), gt, mask, num_groups=2)
    outs = model.apply(
        variables, images, train=False, dn_labels=labels, dn_ref=ref, dn_groups=2
    )
    assert "dn_logits" in outs and len(outs["dn_logits"]) == len(outs["logits"])
    assert outs["dn_logits"][0].shape[1] == labels.shape[1]
    # matching outputs keep their usual query count
    assert outs["logits"][0].shape[1] == model.cfg.num_queries


def test_staged_rtdetr_loop_matches_stepwise(tiny):
    """dn_groups=0, flip=False staged dispatch == stepwise make_rtdetr_train_step
    (single step, tight; multi-step trajectories diverge chaotically — see
    test_train.test_staged_loop_matches_stepwise for the rationale)."""
    import optax

    from facedet_tpu.train.rtdetr_train import (
        make_rtdetr_train_step,
        make_staged_rtdetr_loop,
    )

    model, variables = tiny
    rng = np.random.default_rng(3)
    images_u8 = jnp.asarray(rng.integers(0, 255, (2, 2, 64, 64, 3), dtype=np.uint8))
    gt = np.tile(np.array([[[0.5, 0.5, 0.2, 0.3], [0.3, 0.3, 0.1, 0.1]]]), (2, 2, 1, 1))
    gt_boxes = jnp.asarray(np.stack([gt[0], gt[1]])).astype(jnp.float32)
    gt_mask = jnp.asarray(np.ones((2, 2, 2), bool))
    tx = optax.sgd(1e-4)
    p0, bs0 = variables["params"], variables["batch_stats"]
    opt0 = tx.init(p0)

    run = make_staged_rtdetr_loop(
        model, tx, steps_per_dispatch=1, dn_groups=0, flip=False
    )
    p_a, bs_a, _, loss_a = run(
        p0, bs0, opt0, images_u8, gt_boxes, gt_mask, 0, jax.random.PRNGKey(0)
    )

    step = make_rtdetr_train_step(model, tx, dn_groups=0)
    p_b, bs_b, _, loss_b, _ = step(
        p0, bs0, opt0,
        images_u8[0].astype(jnp.float32) / 255.0, gt_boxes[0], gt_mask[0],
        jax.random.PRNGKey(0),
    )
    assert abs(float(loss_a) - float(loss_b)) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_staged_rtdetr_loop_cdn_flip_trains(tiny):
    """CDN + flip staged dispatch: finite loss, parameters move."""
    import optax

    from facedet_tpu.train.rtdetr_train import make_staged_rtdetr_loop

    model, variables = tiny
    rng = np.random.default_rng(4)
    images_u8 = jnp.asarray(rng.integers(0, 255, (2, 2, 64, 64, 3), dtype=np.uint8))
    gt_boxes = jnp.asarray(
        np.tile(np.array([[[0.4, 0.5, 0.2, 0.3]]], np.float32), (2, 2, 2, 1))
    )
    gt_mask = jnp.asarray(np.ones((2, 2, 2), bool))
    tx = optax.adamw(1e-3)
    p0, bs0 = variables["params"], variables["batch_stats"]
    run = make_staged_rtdetr_loop(model, tx, steps_per_dispatch=3, dn_groups=2)
    p1, _, _, mean_loss = run(
        p0, bs0, tx.init(p0), images_u8, gt_boxes, gt_mask, 0, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(mean_loss))
    assert max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))
    ) > 0


def test_sinkhorn_match_tracks_hungarian():
    """Sinkhorn OT matching vs scipy Hungarian: near-zero excess cost on
    DETR-like structured costs, bounded excess on adversarial uniform noise;
    strictly better than plain greedy on both (the dense-crowd regime that
    motivated it)."""
    from scipy.optimize import linear_sum_assignment

    from facedet_tpu.train.rtdetr_train import greedy_match, sinkhorn_match

    rng = np.random.default_rng(1)

    def excess(match_fn, c):
        m = c.shape[1]
        a = np.asarray(match_fn(jnp.asarray(c[None])))[0]
        assert len(set(a.tolist())) == m  # a valid (injective) assignment
        rows, cols = linear_sum_assignment(c)
        opt = c[rows, cols].sum()
        tot = sum(c[a[i], i] for i in range(m))
        return (tot - opt) / abs(opt)

    # DETR-like structure: spatial distance - confidence
    ex_s, ex_g = [], []
    for _ in range(8):
        m, q = 30, 60
        gt = rng.random((m, 2))
        qr = rng.random((q, 2))
        dist = np.linalg.norm(qr[:, None] - gt[None], axis=-1).astype(np.float32)
        c = dist - 0.3 * rng.random((q, 1)).astype(np.float32)
        ex_s.append(excess(sinkhorn_match, c))
        ex_g.append(excess(greedy_match, c))
    assert np.mean(ex_s) < 0.005, ex_s
    assert np.mean(ex_s) < np.mean(ex_g)

    # adversarial: uniform random costs
    ex_s = [excess(sinkhorn_match, rng.random((60, 40)).astype(np.float32))
            for _ in range(8)]
    assert np.mean(ex_s) < 0.05, ex_s


def test_sinkhorn_match_square_and_exact_cases():
    from facedet_tpu.train.rtdetr_train import sinkhorn_match

    # trivially separable 3x3: must recover the exact permutation
    c = np.full((3, 3), 10.0, np.float32)
    c[0, 1] = c[1, 2] = c[2, 0] = 0.0
    a = np.asarray(sinkhorn_match(jnp.asarray(c[None])))[0]
    assert a.tolist() == [2, 0, 1]


def test_sinkhorn_match_with_dead_gt_sentinels():
    """Production cost layout: _layer_loss pads dead-GT columns with 1e6.
    Without mask-aware statistics those sentinels inflate the OT temperature
    ~1000x and sinkhorn degrades below greedy (regression found in review);
    with col_mask it must stay essentially Hungarian-optimal."""
    from scipy.optimize import linear_sum_assignment

    from facedet_tpu.train.rtdetr_train import sinkhorn_match

    rng = np.random.default_rng(2)
    for n_real in (10, 30):
        q, M = 120, 48
        gt = rng.random((n_real, 2))
        qr = rng.random((q, 2))
        dist = np.linalg.norm(qr[:, None] - gt[None], axis=-1).astype(np.float32)
        real = dist - 0.3 * rng.random((q, 1)).astype(np.float32)
        c = np.full((q, M), 1e6, np.float32)
        c[:, :n_real] = real
        mask = np.zeros(M, bool)
        mask[:n_real] = True
        rows, cols = linear_sum_assignment(real)
        opt = real[rows, cols].sum()
        a = np.asarray(
            sinkhorn_match(jnp.asarray(c[None]), col_mask=jnp.asarray(mask[None]))
        )[0]
        tot = sum(real[a[i], i] for i in range(n_real))
        assert (tot - opt) / abs(opt) < 0.01
        # real columns must get distinct queries
        assert len(set(a[:n_real].tolist())) == n_real
