"""RT-DETR training: Hungarian matching, DETR losses, optax trainer, and the
convert -> train -> validate flow of the reference's pipeline v3.

Reference: pipeline_v3_RTDETR/train_rtdetr.py — WIDERFACE->YOLO conversion
(:12-83, ours in data/widerface.py), dataset yaml (:85-101), ultralytics
``model.train`` with AdamW lr 1e-4 / batch 8 / imgsz 640 / 50 epochs /
patience 10 / save_period 5 (:180-218), ``validate_model`` via mAP (:228-241).

TPU-native: the training step is a pure jitted function; Hungarian assignment
runs through ``jax.pure_callback`` into scipy (static [Q, M] costs, padded
GT), the standard approach since the O(QM) assignment is host-trivial next to
the device forward/backward.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facedet_tpu.models.rtdetr import RtDetr, RtDetrConfig

__all__ = [
    "hungarian_match",
    "greedy_match",
    "sinkhorn_match",
    "match_assignments",
    "build_cdn",
    "rtdetr_loss",
    "make_rtdetr_train_step",
    "RtDetrTrainer",
]


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    """cost [Q, M] -> assignment [M] (query index per GT slot; -1 invalid)."""
    from scipy.optimize import linear_sum_assignment

    q, m = cost.shape
    rows, cols = linear_sum_assignment(cost)
    out = np.full((m,), -1, np.int32)
    out[cols] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array) -> jax.Array:
    """Batched [B, Q, M] cost -> [B, M] assigned query index per GT."""

    def one(c):
        return jax.pure_callback(
            _hungarian_host,
            jax.ShapeDtypeStruct((c.shape[1],), jnp.int32),
            c,
            vmap_method="sequential",
        )

    return jax.vmap(one)(cost)


def greedy_match(cost: jax.Array) -> jax.Array:
    """Pure-JAX greedy bipartite matching: repeatedly take the global minimum
    cost pair, masking its row/column. A standard on-device approximation of
    Hungarian assignment (exact when cost rows are well separated — the usual
    DETR regime after a few epochs). Used where host callbacks are unavailable
    (this environment's TPU plugin rejects jax.pure_callback)."""

    def one(c):  # [Q, M]
        q, m = c.shape

        def body(_, state):
            cm, assign = state
            flat = jnp.argmin(cm)
            qi = (flat // m).astype(jnp.int32)
            mi = (flat % m).astype(jnp.int32)
            assign = assign.at[mi].set(qi)
            cm = cm.at[qi, :].set(jnp.inf)
            cm = cm.at[:, mi].set(jnp.inf)
            return cm, assign

        _, assign = jax.lax.fori_loop(
            0, min(q, m), body, (c, jnp.full((m,), -1, jnp.int32))
        )
        return assign

    return jax.vmap(one)(cost)


def sinkhorn_match(
    cost: jax.Array, eps: float = 0.01, iters: int = 300,
    col_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """On-device near-Hungarian matching via entropic optimal transport.

    The [Q, M] cost is padded to square with constant-cost dummy columns (the
    slack sink — with Q > M and uniform marginals, UNPADDED balanced OT forces
    every query row to carry mass and degrades badly); balanced log-domain
    Sinkhorn at a cold temperature then concentrates the transport plan on the
    optimal assignment, and greedy extraction on the plan recovers it. All
    logsumexp/matvec work — no host callback, no sequential argmin over raw
    costs (plain greedy's failure mode on dense crowds, where locally-best
    pairs cascade into globally poor assignments). Differential-tested vs
    scipy Hungarian (tests/test_rtdetr.py): ~0.01% mean excess cost on
    DETR-like structured instances where plain greedy leaves 5-20% on the
    table, <3% on adversarial uniform-random costs (greedy: ~27%)."""

    def extract(neg_plan):  # greedy on the (negated log-)plan [Q, M]
        q, m = neg_plan.shape

        def body(_, state):
            cm, assign = state
            flat = jnp.argmin(cm)
            qi = (flat // m).astype(jnp.int32)
            mi = (flat % m).astype(jnp.int32)
            assign = assign.at[mi].set(qi)
            cm = cm.at[qi, :].set(jnp.inf)
            cm = cm.at[:, mi].set(jnp.inf)
            return cm, assign

        _, assign = jax.lax.fori_loop(
            0, min(q, m), body, (neg_plan, jnp.full((m,), -1, jnp.int32))
        )
        return assign

    def one(c, cm):  # [Q, M] cost, [M] valid-column mask
        q, m = c.shape
        # temperature scale and slack cost from REAL entries only: DETR loss
        # layers inject a 1e6 sentinel into dead-GT columns (_layer_loss),
        # and folding those into std()/mean() inflates the temperature ~1000x
        # — the transport plan then can't see real cost differences and the
        # matcher degrades below plain greedy (caught by review; the
        # mask-aware statistics below restore the sentinel-free behaviour)
        w = cm.astype(c.dtype)[None, :]
        denom = jnp.maximum(w.sum() * q, 1.0)
        mean_real = (c * w).sum() / denom
        var_real = (((c - mean_real) ** 2) * w).sum() / denom
        scale = jnp.maximum(jnp.sqrt(var_real), 1e-6)
        # dead columns become slack sinks at the mean real cost, exactly like
        # the square-padding columns (their assignments are masked downstream)
        cs = jnp.where(cm[None, :], c, mean_real)
        if q > m:  # square slack columns at mean cost (assignment-invariant)
            cs = jnp.concatenate([cs, jnp.full((q, q - m), mean_real, c.dtype)], 1)
        n = cs.shape[1]
        logK = -cs / (eps * scale)
        log_mu = jnp.full((q,), -jnp.log(q))
        log_nu = jnp.full((n,), -jnp.log(n))

        def it(_, uv):
            u, v = uv
            u = log_mu - jax.nn.logsumexp(logK + v[None, :], axis=1)
            v = log_nu - jax.nn.logsumexp(logK + u[:, None], axis=0)
            return u, v

        u, v = jax.lax.fori_loop(
            0, iters, it, (jnp.zeros((q,)), jnp.zeros((n,)))
        )
        log_plan = (logK + u[:, None] + v[None, :])[:, :m]
        return extract(-log_plan)

    if col_mask is None:
        col_mask = jnp.ones(cost.shape[:1] + cost.shape[2:3], bool)
    return jax.vmap(one)(cost, col_mask)


@functools.lru_cache(maxsize=1)
def callbacks_supported() -> bool:
    """Probe whether the active backend supports host callbacks (the axon TPU
    plugin raises UNIMPLEMENTED for pure_callback)."""
    try:
        f = jax.jit(
            lambda x: jax.pure_callback(
                lambda v: np.asarray(v, np.float32), jax.ShapeDtypeStruct((), jnp.float32), x
            )
        )
        jax.block_until_ready(f(jnp.float32(1.0)))
        return True
    except Exception:
        return False


def match_assignments(
    cost: jax.Array, matcher: str = "auto",
    col_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch: 'hungarian' (scipy via callback), 'sinkhorn' / 'greedy'
    (on-device), or 'auto'. Auto picks hungarian only on CPU: accelerators get
    the on-device greedy matcher (no host round-trips; this environment's TPU
    plugin rejects host callbacks outright, and its probe result is flaky
    across link phases, so the platform check is authoritative).

    Why greedy and not sinkhorn by default: sinkhorn tracks the OPTIMAL
    assignment far closer on static cost matrices (see its docstring), but in
    TRAINING the deterministic A/B on the blob task showed exact matching
    UNDERPERFORMS sticky greedy at short budgets (mAP50 0.37 vs 0.63 at 1500
    steps) — near-optimal assignments flip between steps early in training
    while greedy's locally-best pairs stay put, and assignment stability is
    what young DETRs need (the same instability DN-DETR's denoising targets).
    Pass matcher='sinkhorn' explicitly where assignment optimality matters
    more than stability."""
    if matcher == "auto":
        on_cpu = jax.devices()[0].platform == "cpu"
        matcher = "hungarian" if on_cpu and callbacks_supported() else "greedy"
    if matcher == "hungarian":
        return hungarian_match(cost)
    if matcher == "sinkhorn":
        return sinkhorn_match(cost, col_mask=col_mask)
    if matcher == "greedy":
        return greedy_match(cost)
    raise ValueError(f"unknown matcher {matcher!r}")


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, -1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _giou(a, b, eps=1e-7):
    """Generalized IoU between xyxy box sets of equal shape [..., 4]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    iou = inter / (union + eps)
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.clip(erb - elt, 0.0)
    enclose = ewh[..., 0] * ewh[..., 1]
    return iou - (enclose - union) / (enclose + eps)


def _layer_loss(logits, boxes, gt_boxes, gt_mask, cls_weight, box_weight,
                giou_weight, matcher="auto"):
    """One decoder layer's matched loss. gt_boxes cxcywh normalized [B,M,4]."""
    b, q, nc = logits.shape
    m = gt_boxes.shape[1]
    prob = jax.nn.sigmoid(logits)

    # cost matrix [B, Q, M]
    cost_cls = -prob[..., 0:1]  # single class: negative prob
    l1 = jnp.sum(jnp.abs(boxes[:, :, None, :] - gt_boxes[:, None, :, :]), -1)
    giou = _giou(
        _cxcywh_to_xyxy(boxes)[:, :, None, :], _cxcywh_to_xyxy(gt_boxes)[:, None, :, :]
    )
    cost = cost_cls * 2.0 + l1 * 5.0 - giou * 2.0
    cost = jnp.where(gt_mask[:, None, :], cost, 1e6)
    assign = match_assignments(
        jax.lax.stop_gradient(cost), matcher=matcher, col_mask=gt_mask
    )  # [B, M]

    valid = gt_mask & (assign >= 0)
    a_safe = jnp.maximum(assign, 0)
    sel_boxes = jnp.take_along_axis(boxes, a_safe[..., None].repeat(4, -1), axis=1)
    l1_loss = jnp.sum(
        jnp.sum(jnp.abs(sel_boxes - gt_boxes), -1) * valid
    ) / jnp.maximum(valid.sum(), 1)
    giou_loss = jnp.sum(
        (1.0 - _giou(_cxcywh_to_xyxy(sel_boxes), _cxcywh_to_xyxy(gt_boxes))) * valid
    ) / jnp.maximum(valid.sum(), 1)

    # classification: matched queries -> 1, rest -> 0 (sigmoid focal)
    tgt = jnp.zeros((b, q))
    tgt = jax.vmap(lambda t, a, v: t.at[a].max(v.astype(jnp.float32)))(tgt, a_safe, valid)
    p = prob[..., 0]
    alpha, gamma = 0.25, 2.0
    ce = -(tgt * jnp.log(p + 1e-8) + (1 - tgt) * jnp.log(1 - p + 1e-8))
    pt = tgt * p + (1 - tgt) * (1 - p)
    focal = ce * ((1 - pt) ** gamma) * (tgt * alpha + (1 - tgt) * (1 - alpha))
    cls_loss = focal.sum() / jnp.maximum(valid.sum(), 1)

    return cls_weight * cls_loss + box_weight * l1_loss + giou_weight * giou_loss, {
        "cls": cls_loss,
        "l1": l1_loss,
        "giou": giou_loss,
    }


def build_cdn(
    key: jax.Array,
    gt_boxes: jax.Array,  # [B, M, 4] cxcywh NORMALIZED
    gt_mask: jax.Array,  # [B, M]
    num_groups: int = 5,
    box_noise_scale: float = 1.0,
    num_classes: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Contrastive-denoising query construction (DINO/RT-DETR CDN).

    Per group, every padded GT slot yields a POSITIVE query (GT box with small
    noise, labelled its class) and a NEGATIVE (larger noise, labelled
    background = ``num_classes``). Layout is group-major
    ``[g0:pos(M) neg(M), g1:...]`` so assignments are positional — no matching
    needed for the dn part, which is exactly why CDN stabilises/accelerates
    from-scratch DETR training. Returns (dn_labels [B,N], dn_ref [B,N,4],
    dn_pos_valid [B,N]); N = 2*num_groups*M, all static.
    """
    b, m, _ = gt_boxes.shape
    k_part, k_sign = jax.random.split(key)
    # noise magnitude per coordinate: center within +-w/2 * scale, size +-w
    diff = jnp.concatenate([gt_boxes[..., 2:] / 2, gt_boxes[..., 2:]], -1)
    part = jax.random.uniform(k_part, (b, num_groups, 2, m, 4))
    # positives in [0, 1), negatives in [1, 2) x (scale * diff)
    part = part + jnp.array([0.0, 1.0])[None, None, :, None, None]
    sign = jax.random.rademacher(k_sign, (b, num_groups, 2, m, 4)).astype(jnp.float32)
    noised = gt_boxes[:, None, None] + sign * part * diff[:, None, None] * box_noise_scale
    cx = jnp.clip(noised[..., 0:1], 0.0, 1.0)
    cy = jnp.clip(noised[..., 1:2], 0.0, 1.0)
    wh = jnp.clip(noised[..., 2:4], 1e-4, 1.0)
    dn_ref = jnp.concatenate([cx, cy, wh], -1).reshape(b, num_groups * 2 * m, 4)

    # labels: positive -> class 0 (single class), negative/invalid -> background
    is_pos = jnp.tile(
        jnp.repeat(jnp.array([True, False]), m)[None], (1, num_groups)
    ).reshape(1, -1)  # [1, N]
    slot_valid = jnp.tile(gt_mask, (1, num_groups * 2))  # [B, N]
    dn_labels = jnp.where(is_pos & slot_valid, 0, num_classes).astype(jnp.int32)
    return dn_labels, dn_ref, is_pos & slot_valid


def _dn_layer_loss(logits, boxes, gt_boxes, gt_mask, num_groups,
                   cls_weight, box_weight, giou_weight):
    """Denoising loss with positional (known) assignments."""
    b, n, _ = logits.shape
    m = gt_boxes.shape[1]
    tiled_gt = jnp.tile(gt_boxes, (1, num_groups * 2, 1))  # slot j <-> gt j%m
    is_pos = jnp.tile(
        jnp.repeat(jnp.array([True, False]), m)[None], (1, num_groups)
    ).reshape(1, -1)
    valid = jnp.tile(gt_mask, (1, num_groups * 2))
    pos = is_pos & valid
    npos = jnp.maximum(pos.sum(), 1)

    l1_loss = jnp.sum(jnp.sum(jnp.abs(boxes - tiled_gt), -1) * pos) / npos
    giou_loss = jnp.sum(
        (1.0 - _giou(_cxcywh_to_xyxy(boxes), _cxcywh_to_xyxy(tiled_gt))) * pos
    ) / npos

    p = jax.nn.sigmoid(logits[..., 0])
    tgt = pos.astype(jnp.float32)
    alpha, gamma = 0.25, 2.0
    ce = -(tgt * jnp.log(p + 1e-8) + (1 - tgt) * jnp.log(1 - p + 1e-8))
    pt = tgt * p + (1 - tgt) * (1 - p)
    focal = ce * ((1 - pt) ** gamma) * (tgt * alpha + (1 - tgt) * (1 - alpha))
    # padded-slot negatives carry no signal either way; mask them out
    cls_loss = jnp.sum(focal * valid) / npos
    return cls_weight * cls_loss + box_weight * l1_loss + giou_weight * giou_loss


def rtdetr_loss(
    outputs: dict,
    gt_boxes: jax.Array,  # [B, M, 4] cxcywh NORMALIZED to [0,1]
    gt_mask: jax.Array,  # [B, M]
    cls_weight: float = 1.0,
    box_weight: float = 5.0,
    giou_weight: float = 2.0,
    dn_groups: int = 0,
    matcher: str = "auto",
) -> tuple[jax.Array, dict]:
    """Sum of per-decoder-layer matched losses (DETR aux-loss scheme), plus
    the per-layer CDN denoising loss when the forward carried dn queries."""
    total = 0.0
    parts = {}
    for li, (logits, boxes) in enumerate(zip(outputs["logits"], outputs["boxes"])):
        ll, p = _layer_loss(
            logits, boxes, gt_boxes, gt_mask, cls_weight, box_weight,
            giou_weight, matcher=matcher,
        )
        total = total + ll
        if li == len(outputs["logits"]) - 1:
            parts = p
    total = total / len(outputs["logits"])
    if "dn_logits" in outputs and dn_groups:
        dn_total = 0.0
        for logits, boxes in zip(outputs["dn_logits"], outputs["dn_boxes"]):
            dn_total = dn_total + _dn_layer_loss(
                logits, boxes, gt_boxes, gt_mask, dn_groups,
                cls_weight, box_weight, giou_weight,
            )
        dn_total = dn_total / len(outputs["dn_logits"])
        parts = dict(parts, dn=dn_total)
        total = total + dn_total
    return total, parts


def make_rtdetr_train_step(
    model: RtDetr,
    tx: optax.GradientTransformation,
    dn_groups: int = 5,
    box_noise_scale: float = 1.0,
):
    """Jitted train step. ``dn_groups > 0`` enables contrastive denoising
    (the from-scratch convergence equalizer for the reference's pretrained
    fine-tune, pipeline_v3_RTDETR/train_rtdetr.py:162); the step then takes a
    PRNG key for the noise."""

    def loss_fn(params, batch_stats, images, gt_boxes, gt_mask, key):
        kwargs = {}
        if dn_groups:
            dn_labels, dn_ref, _ = build_cdn(
                key, gt_boxes, gt_mask, dn_groups, box_noise_scale,
                model.cfg.num_classes,
            )
            kwargs = dict(dn_labels=dn_labels, dn_ref=dn_ref, dn_groups=dn_groups)
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            **kwargs,
        )
        total, parts = rtdetr_loss(outs, gt_boxes, gt_mask, dn_groups=dn_groups)
        return total, (parts, mutated["batch_stats"])

    @jax.jit
    def step(params, batch_stats, opt_state, images, gt_boxes, gt_mask, key):
        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, gt_boxes, gt_mask, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, parts

    return step


def make_staged_rtdetr_loop(
    model: RtDetr,
    tx: optax.GradientTransformation,
    steps_per_dispatch: int = 50,
    dn_groups: int = 5,
    box_noise_scale: float = 1.0,
    flip: bool = True,
):
    """Scan-on-device RT-DETR training (the DETR twin of
    ``yolo_train.make_staged_train_loop``): uint8 batches ``[N, B, H, W, 3]``
    and normalised-cxcywh GT live in HBM; each dispatch runs
    ``steps_per_dispatch`` CDN train steps inside one ``lax.fori_loop`` with
    on-device normalisation and per-sample horizontal flip (cx -> 1 - cx).
    Removes the per-step host round trip over remote links. ``run(params,
    batch_stats, opt_state, images_u8, gt_boxes, gt_mask, start, key)``."""

    def loss_fn(params, batch_stats, images, gt_boxes, gt_mask, key):
        kwargs = {}
        if dn_groups:
            dn_labels, dn_ref, _ = build_cdn(
                key, gt_boxes, gt_mask, dn_groups, box_noise_scale,
                model.cfg.num_classes,
            )
            kwargs = dict(dn_labels=dn_labels, dn_ref=dn_ref, dn_groups=dn_groups)
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
            **kwargs,
        )
        total, parts = rtdetr_loss(outs, gt_boxes, gt_mask, dn_groups=dn_groups)
        return total, (parts, mutated["batch_stats"])

    @jax.jit
    def run(params, batch_stats, opt_state, images_u8, gt_boxes, gt_mask,
            start, key):
        n_staged = images_u8.shape[0]

        def body(i, carry):
            params, bstats, opt_state, loss_sum = carry
            idx = (start + i) % n_staged
            img = jnp.take(images_u8, idx, axis=0).astype(jnp.float32) / 255.0
            bx = jnp.take(gt_boxes, idx, axis=0)
            mk = jnp.take(gt_mask, idx, axis=0)
            k = jax.random.fold_in(key, i)
            if flip:
                kf, k = jax.random.split(k)
                flips = jax.random.bernoulli(kf, shape=(img.shape[0],))
                img = jnp.where(flips[:, None, None, None], img[:, :, ::-1, :], img)
                fb = bx.at[..., 0].set(1.0 - bx[..., 0])
                bx = jnp.where(flips[:, None, None], fb, bx)
            bx = bx * mk[..., None]  # dead rows: flip would leave cx=1 garbage
            (loss, (_parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, bstats, img, bx, mk, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, loss_sum + loss)

        params, batch_stats, opt_state, loss_sum = jax.lax.fori_loop(
            0, steps_per_dispatch, body,
            (params, batch_stats, opt_state, jnp.float32(0.0)),
        )
        return params, batch_stats, opt_state, loss_sum / steps_per_dispatch

    return run


class RtDetrTrainer:
    """Training driver with the reference's checkpoint policy:
    best.pt/last.pt-style saves, save_period, patience early stop
    (train_rtdetr.py:211-224) — checkpoints as .npz + results.csv rollup
    consumable by the check_best_pt tool."""

    def __init__(
        self,
        cfg: RtDetrConfig,
        lr: float = 1e-4,
        weight_decay: float = 1e-4,
        output_dir: str = "runs/rtdetr",
        patience: int = 10,
        save_period: int = 5,
        image_size: int = 640,
        seed: int = 0,
        dn_groups: int = 5,
        warmup_steps: int = 100,
        total_steps: Optional[int] = None,
    ):
        from facedet_tpu.models.rtdetr import create_rtdetr

        self.cfg = cfg
        self.image_size = image_size
        self.model, variables = create_rtdetr(cfg, jax.random.PRNGKey(seed), image_size)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if total_steps:  # warmup -> cosine decay (from-scratch schedule)
            schedule = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup_steps, total_steps, end_value=lr * 0.05
            )
        else:  # warmup -> constant (the reference's constant-AdamW regime)
            schedule = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps), optax.constant_schedule(lr)],
                [warmup_steps],
            )
        self.tx = optax.chain(
            optax.clip_by_global_norm(0.1),
            optax.adamw(schedule, weight_decay=weight_decay),
        )
        self.opt_state = self.tx.init(self.params)
        self.step_fn = make_rtdetr_train_step(self.model, self.tx, dn_groups=dn_groups)
        self._rng = jax.random.PRNGKey(seed + 1)
        self.output_dir = output_dir
        self.patience = patience
        self.save_period = save_period
        self.history: list[dict] = []
        self.best_loss = float("inf")
        self.epochs_without_improvement = 0

    def save_checkpoint(self, name: str):
        from facedet_tpu.engine.detector import save_params_npz

        os.makedirs(self.output_dir, exist_ok=True)
        save_params_npz(
            os.path.join(self.output_dir, f"{name}.npz"),
            {"params": self.params, "batch_stats": self.batch_stats},
        )

    def train_epoch(self, batches: Iterable[tuple]) -> float:
        losses = []
        for images, gt_boxes, gt_mask in batches:
            self._rng, key = jax.random.split(self._rng)
            self.params, self.batch_stats, self.opt_state, loss, parts = self.step_fn(
                self.params, self.batch_stats, self.opt_state,
                images, gt_boxes, gt_mask, key,
            )
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else 0.0

    def fit(self, epoch_batches, num_epochs: int = 50, verbose: bool = True) -> dict:
        """epoch_batches: callable(epoch) -> iterable of (images, boxes, mask)."""
        for epoch in range(num_epochs):
            mean_loss = self.train_epoch(epoch_batches(epoch))
            self.history.append({"epoch": epoch, "train_loss": mean_loss})
            if verbose:
                print(f"epoch {epoch}: loss {mean_loss:.4f}")
            self.save_checkpoint("last")
            if self.save_period and (epoch + 1) % self.save_period == 0:
                self.save_checkpoint(f"epoch{epoch + 1}")
            if mean_loss < self.best_loss - 1e-6:
                self.best_loss = mean_loss
                self.epochs_without_improvement = 0
                self.save_checkpoint("best")
            else:
                self.epochs_without_improvement += 1
                if self.epochs_without_improvement >= self.patience:
                    if verbose:
                        print(f"early stop at epoch {epoch} (patience {self.patience})")
                    break
        os.makedirs(self.output_dir, exist_ok=True)
        with open(os.path.join(self.output_dir, "results.json"), "w") as f:
            json.dump(self.history, f, indent=2)
        # results.csv for the check_best_pt-style rollup
        with open(os.path.join(self.output_dir, "results.csv"), "w") as f:
            f.write("epoch,train_loss\n")
            for h in self.history:
                f.write(f"{h['epoch']},{h['train_loss']:.6f}\n")
        return {"best_loss": self.best_loss, "epochs": len(self.history)}

    def as_detection_model(self, confidence_threshold: float = 0.25):
        """Wrap the current params as an inference DetectionModel."""
        from facedet_tpu.engine.rtdetr_wrapper import RtDetrDetectionModel

        model = RtDetrDetectionModel(
            confidence_threshold=confidence_threshold,
            image_size=self.image_size,
            load_at_init=False,
        )
        model.cfg = self.cfg
        model.model = self.model
        model.variables = {"params": self.params, "batch_stats": self.batch_stats}
        return model

    def validate(self, dataset, image_loader, use_sahi: bool = False) -> dict:
        """COCO mAP validation -> {'map', 'map50', 'map75'}
        (reference pipeline_v3_RTDETR/train_rtdetr.py:228-241 validate_model)."""
        from facedet_tpu.tools.misc import validate_detector

        return validate_detector(
            self.as_detection_model(), dataset, image_loader, use_sahi=use_sahi
        )
