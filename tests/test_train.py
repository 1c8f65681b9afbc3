import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.models.yolov11 import YoloConfig, YoloV11
from facedet_tpu.train.yolo_train import make_optimizer, make_train_step, yolo_loss

CFG = YoloConfig(scale="n", num_classes=1, with_pose=True)


@pytest.fixture(scope="module")
def setup():
    model = YoloV11(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, variables


def make_batch(b=2, m=3, size=64, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(4, size - 24, (b, m, 2))
    wh = rng.uniform(8, 20, (b, m, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    mask = np.ones((b, m), bool)
    mask[:, -1] = False  # one padded GT per image
    kpts = np.zeros((b, m, 5, 3), np.float32)
    kpts[..., 0] = boxes[..., None, 0] + wh[..., None, 0] / 2
    kpts[..., 1] = boxes[..., None, 1] + wh[..., None, 1] / 2
    kpts[..., 2] = 1.0
    images = rng.uniform(0, 1, (b, size, size, 3)).astype(np.float32)
    return (
        jnp.asarray(images),
        jnp.asarray(boxes),
        jnp.asarray(mask),
        jnp.asarray(kpts),
    )


def test_loss_finite_and_parts(setup):
    model, variables = setup
    images, boxes, mask, kpts = make_batch()
    outs = model.apply(variables, images, train=False)
    total, parts = yolo_loss(outs, boxes, mask, kpts)
    assert np.isfinite(float(total))
    for key in ("box", "cls", "dfl", "kpt", "kobj"):
        assert key in parts and np.isfinite(float(parts[key]))


def test_train_step_reduces_loss(setup):
    model, variables = setup
    tx = make_optimizer(lr=5e-3, warmup_steps=1)
    step = make_train_step(model, tx)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    images, boxes, mask, kpts = make_batch()
    losses = []
    for _ in range(6):
        params, batch_stats, opt_state, loss, _ = step(
            params, batch_stats, opt_state, images, boxes, mask, kpts
        )
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_loss_without_keypoints(setup):
    model, variables = setup
    images, boxes, mask, _ = make_batch()
    outs = model.apply(variables, images, train=False)
    outs = [{k: v for k, v in lvl.items() if k != "kpt"} for lvl in outs]
    total, parts = yolo_loss(outs, boxes, mask, None)
    assert np.isfinite(float(total)) and "kpt" not in parts


def test_tal_assigner_properties():
    import jax.numpy as jnp
    from facedet_tpu.train.yolo_train import tal_assign

    # 8x8 grid of anchors, stride 8 -> 64 anchors over 64px image
    ys = (jnp.arange(8) + 0.5) * 8
    anchors = jnp.stack(jnp.meshgrid(ys, ys, indexing="ij"), -1).reshape(-1, 2)[:, ::-1]
    pred_boxes = jnp.concatenate([anchors - 6, anchors + 6], -1)
    pred_scores = jnp.full((64, 1), 0.5)
    gt = jnp.array([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 0.0, 0.0]])
    mask = jnp.array([True, False])
    fg, best_gt, norm = tal_assign(anchors, pred_boxes, pred_scores, gt, mask)
    fg_np = np.asarray(fg)
    assert fg_np.sum() > 0
    # all foreground anchors lie inside the (only valid) GT box
    centers = np.asarray(anchors)[fg_np]
    assert (centers >= 8).all() and (centers <= 40).all()
    assert (np.asarray(best_gt)[fg_np] == 0).all()
    assert np.asarray(norm)[fg_np].max() <= 1.0 + 1e-6


def test_tal_loss_trains(setup):
    model, variables = setup
    tx = make_optimizer(lr=5e-3, warmup_steps=1)
    step = make_train_step(model, tx)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    images, boxes, mask, kpts = make_batch(seed=5)
    losses = []
    for _ in range(6):
        params, batch_stats, opt_state, loss, parts = step(
            params, batch_stats, opt_state, images, boxes, mask, kpts
        )
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def _staged_data(n=3, b=2, m=3, size=64, seed=5):
    """uint8 staged batches with zero-padded dead GT rows (the staged loop's
    canonical layout)."""
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (n, b, size, size, 3), dtype=np.uint8)
    xy = rng.uniform(4, size - 24, (n, b, m, 2))
    wh = rng.uniform(8, 20, (n, b, m, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    mask = np.ones((n, b, m), bool)
    mask[:, :, -1] = False
    boxes[~mask] = 0.0
    kpts = np.zeros((n, b, m, 5, 3), np.float32)
    return (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(mask),
            jnp.asarray(kpts))


def test_staged_loop_matches_stepwise(setup):
    """flip=False staged dispatch == the same batches through make_train_step.

    Tolerances: a single step agrees to float-fusion noise (~1e-5). Across
    k steps the two jit programs compile differently, so per-step 1e-5
    gradient noise compounds through the nonlinear loss — identical LOGIC,
    chaotically diverging float trajectories (measured ~3e-4 after 4 SGD
    steps). The k-step check therefore uses a loose bound that still catches
    real defects (wrong batch order / a dropped flip-gate / double update all
    shift params by ~lr = 1e-3 or more per step). SGD, not Adam: adam's
    first-step update is ~lr*sign(grad), which amplifies sign flips of
    near-zero grads to 2*lr regardless of tolerance."""
    from facedet_tpu.train.yolo_train import make_staged_train_loop

    import optax

    model, variables = setup
    images, boxes, mask, kpts = _staged_data()
    tx = optax.sgd(1e-3)
    p0, bs0 = variables["params"], variables["batch_stats"]
    opt0 = tx.init(p0)

    def stepwise(k):
        step = make_train_step(model, tx)
        p_b, bs_b, opt_b = p0, bs0, opt0
        losses = []
        for i in range(k):
            j = i % images.shape[0]
            p_b, bs_b, opt_b, loss, _ = step(
                p_b, bs_b, opt_b,
                images[j].astype(jnp.float32) / 255.0, boxes[j], mask[j], kpts[j],
            )
            losses.append(float(loss))
        return p_b, bs_b, losses

    # single step: tight
    run1 = make_staged_train_loop(model, tx, steps_per_dispatch=1, flip=False)
    p_a, bs_a, _, loss_a = run1(
        p0, bs0, opt0, images, boxes, mask, kpts, 0, jax.random.PRNGKey(0)
    )
    p_b, bs_b, losses = stepwise(1)
    assert abs(float(loss_a) - losses[0]) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_a), jax.tree_util.tree_leaves(bs_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # k steps with round-robin wrap past n_staged=3: functional check only
    k = 4
    runk = make_staged_train_loop(model, tx, steps_per_dispatch=k, flip=False)
    p_a, bs_a, _, mean_loss = runk(
        p0, bs0, opt0, images, boxes, mask, kpts, 0, jax.random.PRNGKey(0)
    )
    p_b, bs_b, losses = stepwise(k)
    # per-batch losses span 34-41 here, so a batch-order/indexing bug moves
    # the mean by several units; chaotic float divergence moves it ~0.3.
    # No multi-step param comparison: per-element divergence is chaotic and
    # unbounded for the hottest BN params (measured 2e-3..7e-3 run to run),
    # so only the functional (loss) agreement is asserted beyond one step.
    assert abs(float(mean_loss) - np.mean(losses)) < 1.0


def test_staged_loop_flip_trains(setup):
    """With augmentation on, the dispatch still makes finite progress and
    changes parameters."""
    from facedet_tpu.train.yolo_train import make_staged_train_loop

    model, variables = setup
    images, boxes, mask, kpts = _staged_data(seed=7)
    tx = make_optimizer(lr=1e-3, warmup_steps=0)
    p0, bs0 = variables["params"], variables["batch_stats"]
    run = make_staged_train_loop(model, tx, steps_per_dispatch=3, flip=True)
    p1, bs1, opt1, mean_loss = run(
        p0, bs0, tx.init(p0), images, boxes, mask, kpts, 0, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(mean_loss))
    deltas = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))
    ]
    assert max(deltas) > 0


def test_sharded_staged_loop_on_mesh(setup):
    """Scan-on-device training sharded over the 8-device CPU mesh: batch axis
    over dp, params FSDP over tile; result matches the single-device staged
    loop on the same inputs (flip off, SGD — see the stepwise test for why)."""
    import optax

    from facedet_tpu.parallel.mesh import create_mesh
    from facedet_tpu.train.yolo_train import (
        make_sharded_staged_train_loop,
        make_staged_train_loop,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device forced-CPU mesh")
    mesh = create_mesh(8)  # dp=4, tile=2
    model, variables = setup
    # batch must divide dp=4
    images, boxes, mask, kpts = _staged_data(n=2, b=4, m=3)
    tx = optax.sgd(1e-3)
    p0, bs0 = variables["params"], variables["batch_stats"]
    opt0 = tx.init(p0)

    jit_run, shard_state = make_sharded_staged_train_loop(
        model, tx, mesh, steps_per_dispatch=2, flip=False
    )
    sp, sbs, sopt = shard_state(p0, bs0, opt0)
    run = jit_run(p0, bs0, opt0)
    p_a, bs_a, opt_a, loss_a = run(
        sp, sbs, sopt, images, boxes, mask, kpts, 0, jax.random.PRNGKey(0)
    )

    ref_run = make_staged_train_loop(model, tx, steps_per_dispatch=2, flip=False)
    p_b, bs_b, _, loss_b = ref_run(
        p0, bs0, opt0, images, boxes, mask, kpts, 0, jax.random.PRNGKey(0)
    )
    assert abs(float(loss_a) - float(loss_b)) < 1e-2
    # sharded collectives reduce in a different order than the single-device
    # program; per-step float noise compounds chaotically across the 2 steps
    # (measured 4.5e-4 max) — same tolerance policy as the stepwise test
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_scrfd_loss_and_step_learns():
    """SCRFD trainer (train/scrfd_train.py): loss is finite and decreases on
    a fixed tiny batch — the unit-scale analog of selftrain_demo --model
    scrfd (VERDICT r3 #5)."""
    import dataclasses

    import optax

    from facedet_tpu.models.scrfd import SCRFD_VARIANTS, Scrfd
    from facedet_tpu.train.scrfd_train import make_scrfd_train_step, scrfd_loss

    cfg = dataclasses.replace(
        SCRFD_VARIANTS["scrfd_500m"],
        stem=8, widths=(8, 12, 16, 24), depths=(1, 1, 1, 1), neck=16,
        head_width=16, dtype="float32",
    )
    model = Scrfd(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    images[0, 8:24, 8:24] = 1.0
    images[1, 30:60, 20:50] = 1.0
    boxes = jnp.asarray([[[8.0, 8.0, 24.0, 24.0]], [[20.0, 30.0, 50.0, 60.0]]])
    mask = jnp.ones((2, 1), bool)
    kpts = jnp.zeros((2, 1, 5, 3)).at[..., :2].set(16.0).at[..., 2].set(1.0)

    # loss function alone: finite, has the expected parts
    outs = model.apply({"params": params, "batch_stats": batch_stats},
                       jnp.asarray(images), train=False)
    total, parts = scrfd_loss(outs, boxes, mask, kpts)
    assert np.isfinite(float(total))
    assert set(parts) == {"box", "cls", "kps"}

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)
    step = make_scrfd_train_step(model, tx)
    first = last = None
    for i in range(25):
        params, batch_stats, opt_state, loss, _ = step(
            params, batch_stats, opt_state,
            jnp.asarray(images), boxes, mask, kpts,
        )
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert np.isfinite(last) and last < first, (first, last)


def test_scrfd_staged_loop_matches_stepwise():
    """SCRFD staged scan-on-device dispatch (flip=False) == the same batches
    through make_scrfd_train_step — the golden fine-tune's scrfd arm rides
    the shared staged body with scrfd_loss injected."""
    import dataclasses

    import optax

    from facedet_tpu.models.scrfd import SCRFD_VARIANTS, Scrfd
    from facedet_tpu.train.scrfd_train import (
        make_scrfd_staged_loop,
        make_scrfd_train_step,
    )

    cfg = dataclasses.replace(
        SCRFD_VARIANTS["scrfd_500m"],
        stem=8, widths=(8, 12, 16, 24), depths=(1, 1, 1, 1), neck=16,
        head_width=16, dtype="float32",
    )
    model = Scrfd(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    p0, bs0 = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (3, 2, 64, 64, 3)).astype(np.uint8)
    boxes = jnp.asarray(
        rng.uniform(4, 28, (3, 2, 2, 4)).astype(np.float32)
    )
    boxes = jnp.concatenate([boxes[..., :2], boxes[..., :2] + 16.0], -1)
    mask = jnp.ones((3, 2, 2), bool)
    kpts = jnp.zeros((3, 2, 2, 5, 3)).at[..., :2].set(12.0).at[..., 2].set(1.0)

    tx = optax.sgd(1e-3)
    opt0 = tx.init(p0)
    run1 = make_scrfd_staged_loop(model, tx, steps_per_dispatch=1, flip=False)
    p_a, bs_a, _, loss_a = run1(
        p0, bs0, opt0, jnp.asarray(images), boxes, mask, kpts,
        0, jax.random.PRNGKey(0),
    )

    step = make_scrfd_train_step(model, tx)
    p_b, bs_b, _, loss_b, _ = step(
        p0, bs0, opt0,
        jnp.asarray(images[0]).astype(jnp.float32) / 255.0,
        boxes[0], mask[0], kpts[0],
    )
    assert abs(float(loss_a) - float(loss_b)) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
