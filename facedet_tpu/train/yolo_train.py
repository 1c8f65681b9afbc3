"""YOLOv11(-pose) training: loss, assigner, optax trainer, sharded train step.

The reference trains through ultralytics' closed trainer
(pipeline_v3_RTDETR/train_rtdetr.py:162-218 — AdamW lr 1e-4, batch 8; the
YOLO-pose checkpoints of ``hasil training.txt`` come from the same stack).
Here training is an explicit jitted step:

  * center-inside + nearest-center one-to-one assigner (static shapes; a
    simplified stand-in for TAL that keeps every op MXU/VPU friendly)
  * DFL two-hot cross-entropy on ltrb distances + IoU loss + BCE cls
  * optional 5-keypoint loss (L1 + visibility BCE)
  * multi-chip: batch sharded over ``dp``, params FSDP-sharded over ``tile``;
    XLA inserts the grad reduce-scatter/all-reduce from the shardings.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from facedet_tpu.models.yolov11 import REG_MAX, STRIDES, YoloV11
from facedet_tpu.parallel.sharding import (
    batch_sharding,
    fsdp_param_shardings,
    replicated,
    staged_sharding,
)

__all__ = [
    "yolo_loss",
    "make_optimizer",
    "make_train_step",
    "make_staged_train_loop",
    "make_sharded_staged_train_loop",
    "make_sharded_train_step",
]


def _flat_anchors(level_shapes: list[tuple[int, int]]):
    anchors, strides = [], []
    for (h, w), s in zip(level_shapes, STRIDES):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        anchors.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        strides.append(jnp.full((h * w,), float(s)))
    return jnp.concatenate(anchors), jnp.concatenate(strides)


def _assign(anchors, strides, gt_boxes, gt_mask):
    """One anchor per GT: nearest anchor center among those inside the box
    (fallback: globally nearest). Returns [M] anchor indices."""
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    inside = (
        (anchors[None, :, 0] >= gt_boxes[:, None, 0])
        & (anchors[None, :, 0] <= gt_boxes[:, None, 2])
        & (anchors[None, :, 1] >= gt_boxes[:, None, 1])
        & (anchors[None, :, 1] <= gt_boxes[:, None, 3])
    )
    # prefer the level whose stride matches the box size (size/stride in [2,8])
    size = jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], gt_boxes[:, 3] - gt_boxes[:, 1])
    ratio = size[:, None] / strides[None, :]
    level_ok = (ratio >= 1.5) & (ratio < 12.0)
    dist = jnp.hypot(anchors[None, :, 0] - cx[:, None], anchors[None, :, 1] - cy[:, None])
    cost = dist + jnp.where(inside, 0.0, 1e6) + jnp.where(level_ok, 0.0, 1e3)
    return jnp.argmin(cost, axis=1)  # [M]


def tal_assign(
    anchors: jax.Array,  # [A, 2] centers (px)
    pred_boxes: jax.Array,  # [A, 4] decoded xyxy
    pred_scores: jax.Array,  # [A, C] sigmoid probs
    gt_boxes: jax.Array,  # [M, 4] xyxy
    gt_mask: jax.Array,  # [M]
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Task-aligned assignment (the published TAL scheme ultralytics trains
    YOLOv8/11 with): per GT, the top-k anchors inside the box by alignment
    metric ``score^alpha * IoU^beta``; anchor conflicts resolve to the GT with
    the highest IoU. Fully vectorised — no data-dependent shapes.

    Returns (fg_mask [A], assigned_gt [A] index, norm_align [A] — the
    IoU-normalised alignment used as the cls target)."""
    m, a = gt_boxes.shape[0], anchors.shape[0]
    iou = _iou_xyxy(gt_boxes[:, None, :], pred_boxes[None, :, :])  # [M, A]
    score = pred_scores[:, 0][None, :]  # single class: [1, A] -> broadcast
    align = (score**alpha) * (iou**beta)  # [M, A]
    inside = (
        (anchors[None, :, 0] >= gt_boxes[:, None, 0])
        & (anchors[None, :, 0] <= gt_boxes[:, None, 2])
        & (anchors[None, :, 1] >= gt_boxes[:, None, 1])
        & (anchors[None, :, 1] <= gt_boxes[:, None, 3])
    ) & gt_mask[:, None]
    align = jnp.where(inside, align, 0.0)

    k = min(topk, a)
    top_vals, _ = jax.lax.top_k(align, k)  # [M, k]
    kth = top_vals[:, -1:]  # threshold per GT
    cand = inside & (align >= jnp.maximum(kth, 1e-12))  # [M, A]

    # conflict resolution: anchor claimed by several GT goes to max-IoU GT
    iou_masked = jnp.where(cand, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=0)  # [A]
    fg = jnp.max(iou_masked, axis=0) >= 0.0
    # normalised alignment target (TAL: align * max_iou / max_align per GT)
    max_align = jnp.max(align, axis=1, keepdims=True)
    max_iou = jnp.max(jnp.where(cand, iou, 0.0), axis=1, keepdims=True)
    norm = align * max_iou / jnp.maximum(max_align, 1e-9)  # [M, A]
    norm_align = jnp.where(
        fg, norm[best_gt, jnp.arange(a)], 0.0
    )
    return fg, best_gt, norm_align


def _iou_xyxy(a, b, eps=1e-7):
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / (area_a + area_b - inter + eps)


def yolo_loss(
    level_outputs: list[dict],
    gt_boxes: jax.Array,  # [B, M, 4] xyxy pixels
    gt_mask: jax.Array,  # [B, M] bool
    gt_kpts: Optional[jax.Array] = None,  # [B, M, K, 3] (x, y, vis)
    box_weight: float = 7.5,
    cls_weight: float = 0.5,
    dfl_weight: float = 1.5,
    kpt_weight: float = 12.0,
    kobj_weight: float = 1.0,
    use_tal: bool = True,
) -> tuple[jax.Array, dict]:
    level_shapes = [(lvl["box"].shape[1], lvl["box"].shape[2]) for lvl in level_outputs]
    anchors, strides = _flat_anchors(level_shapes)
    a_total = anchors.shape[0]
    b = level_outputs[0]["box"].shape[0]
    nc = level_outputs[0]["cls"].shape[-1]

    box_logits = jnp.concatenate(
        [lvl["box"].reshape(b, -1, 4, REG_MAX) for lvl in level_outputs], axis=1
    )
    cls_logits = jnp.concatenate(
        [lvl["cls"].reshape(b, -1, nc) for lvl in level_outputs], axis=1
    )
    has_kpt = gt_kpts is not None and "kpt" in level_outputs[0]
    if has_kpt:
        k = gt_kpts.shape[-2]
        kpt_raw = jnp.concatenate(
            [lvl["kpt"].reshape(b, -1, k, 3) for lvl in level_outputs], axis=1
        )

    proj_full = jnp.arange(REG_MAX, dtype=jnp.float32)

    def per_image_tal(box_lg, cls_lg, boxes, mask, kpt_lg=None, kpts=None):
        """TAL multi-positive assignment over all anchors (the v8/v11 loss)."""
        # decode every anchor's box once (shared by assigner and IoU loss)
        dist_all = (jax.nn.softmax(box_lg, -1) * proj_full).sum(-1)  # [A,4]
        pred_boxes = jnp.stack(
            [
                anchors[:, 0] - dist_all[:, 0] * strides,
                anchors[:, 1] - dist_all[:, 1] * strides,
                anchors[:, 0] + dist_all[:, 2] * strides,
                anchors[:, 1] + dist_all[:, 3] * strides,
            ],
            axis=-1,
        )
        pred_scores = jax.nn.sigmoid(cls_lg)  # [A,C]
        fg, best_gt, norm_align = tal_assign(
            anchors, jax.lax.stop_gradient(pred_boxes),
            jax.lax.stop_gradient(pred_scores), boxes, mask,
        )
        tgt_boxes = boxes[best_gt]  # [A,4]
        wsum = jnp.maximum(norm_align.sum(), 1.0)

        iou = _iou_xyxy(pred_boxes, tgt_boxes)
        box_l = (jnp.where(fg, (1.0 - iou) * norm_align, 0.0)).sum() / wsum

        # DFL on target ltrb distances at fg anchors
        ltrb = jnp.stack(
            [
                (anchors[:, 0] - tgt_boxes[:, 0]) / strides,
                (anchors[:, 1] - tgt_boxes[:, 1]) / strides,
                (tgt_boxes[:, 2] - anchors[:, 0]) / strides,
                (tgt_boxes[:, 3] - anchors[:, 1]) / strides,
            ],
            axis=-1,
        )
        ltrb = jnp.clip(ltrb, 0.0, REG_MAX - 1 - 1e-3)
        lo = jnp.floor(ltrb)
        w_hi = ltrb - lo
        logp = jax.nn.log_softmax(box_lg, axis=-1)  # [A,4,REG_MAX]
        lo_i = lo.astype(jnp.int32)
        lp_lo = jnp.take_along_axis(logp, lo_i[..., None], -1)[..., 0]
        lp_hi = jnp.take_along_axis(
            logp, jnp.minimum(lo_i + 1, REG_MAX - 1)[..., None], -1
        )[..., 0]
        dfl_all = -((1 - w_hi) * lp_lo + w_hi * lp_hi)  # [A,4]
        dfl = (jnp.where(fg, dfl_all.mean(-1) * norm_align, 0.0)).sum() / wsum

        # classification: target = normalised alignment at class 0
        tgt = jnp.zeros((a_total, nc)).at[:, 0].set(norm_align)
        cls_l = optax.sigmoid_binary_cross_entropy(cls_lg, tgt).sum() / wsum

        out = {"box": box_l, "cls": cls_l, "dfl": dfl}
        if kpt_lg is not None:
            tgt_kpts = kpts[best_gt]  # [A,K,3]
            px = (kpt_lg[..., 0] * 2.0 + (anchors[:, None, 0] / strides[:, None] - 0.5)) * strides[:, None]
            py = (kpt_lg[..., 1] * 2.0 + (anchors[:, None, 1] / strides[:, None] - 0.5)) * strides[:, None]
            vis = (tgt_kpts[..., 2] > 0) & fg[:, None]
            kw = jnp.maximum(vis.sum(), 1)
            size = jnp.maximum(tgt_boxes[:, 2] - tgt_boxes[:, 0], 1.0)[:, None]
            kl = (jnp.abs(px - tgt_kpts[..., 0]) + jnp.abs(py - tgt_kpts[..., 1])) / size
            out["kpt"] = (kl * vis).sum() / kw
            out["kobj"] = (
                optax.sigmoid_binary_cross_entropy(
                    kpt_lg[..., 2], vis.astype(jnp.float32)
                )
                * fg[:, None]
            ).sum() / kw
        return out

    def per_image(box_lg, cls_lg, boxes, mask, kpt_lg=None, kpts=None):
        m = boxes.shape[0]
        idx = _assign(anchors, strides, boxes, mask)  # [M]
        pos_anchor = anchors[idx]  # [M,2]
        pos_stride = strides[idx]  # [M]

        # ---- DFL on ltrb distances (cell units) ----
        ltrb = jnp.stack(
            [
                (pos_anchor[:, 0] - boxes[:, 0]) / pos_stride,
                (pos_anchor[:, 1] - boxes[:, 1]) / pos_stride,
                (boxes[:, 2] - pos_anchor[:, 0]) / pos_stride,
                (boxes[:, 3] - pos_anchor[:, 1]) / pos_stride,
            ],
            axis=-1,
        )
        ltrb = jnp.clip(ltrb, 0.0, REG_MAX - 1 - 1e-3)
        lo = jnp.floor(ltrb)
        w_hi = ltrb - lo
        logp = jax.nn.log_softmax(box_lg[idx], axis=-1)  # [M,4,REG_MAX]
        lo_i = lo.astype(jnp.int32)
        lp_lo = jnp.take_along_axis(logp, lo_i[..., None], -1)[..., 0]
        lp_hi = jnp.take_along_axis(
            logp, jnp.minimum(lo_i + 1, REG_MAX - 1)[..., None], -1
        )[..., 0]
        dfl = -((1 - w_hi) * lp_lo + w_hi * lp_hi)
        dfl = (dfl.mean(-1) * mask).sum() / jnp.maximum(mask.sum(), 1)

        # ---- IoU loss on decoded boxes ----
        proj = jnp.arange(REG_MAX, dtype=jnp.float32)
        dist = (jax.nn.softmax(box_lg[idx], -1) * proj).sum(-1)  # [M,4]
        pred_box = jnp.stack(
            [
                pos_anchor[:, 0] - dist[:, 0] * pos_stride,
                pos_anchor[:, 1] - dist[:, 1] * pos_stride,
                pos_anchor[:, 0] + dist[:, 2] * pos_stride,
                pos_anchor[:, 1] + dist[:, 3] * pos_stride,
            ],
            axis=-1,
        )
        iou = _iou_xyxy(pred_box, boxes)
        box_l = ((1.0 - iou) * mask).sum() / jnp.maximum(mask.sum(), 1)

        # ---- classification BCE over all anchors ----
        tgt = jnp.zeros((a_total, nc))
        tgt = tgt.at[idx, 0].max(mask.astype(jnp.float32) * jnp.maximum(iou, 0.0))
        cls_l = optax.sigmoid_binary_cross_entropy(cls_lg, tgt).sum() / jnp.maximum(
            mask.sum(), 1
        )

        out = {"box": box_l, "cls": cls_l, "dfl": dfl}
        if kpt_lg is not None:
            pk = kpt_lg[idx]  # [M,K,3]
            px = (pk[..., 0] * 2.0 + (pos_anchor[:, None, 0] / pos_stride[:, None] - 0.5)) * pos_stride[:, None]
            py = (pk[..., 1] * 2.0 + (pos_anchor[:, None, 1] / pos_stride[:, None] - 0.5)) * pos_stride[:, None]
            vis = kpts[..., 2] > 0
            wsum = jnp.maximum((vis * mask[:, None]).sum(), 1)
            size = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)[:, None]
            kl = (jnp.abs(px - kpts[..., 0]) + jnp.abs(py - kpts[..., 1])) / size
            out["kpt"] = (kl * vis * mask[:, None]).sum() / wsum
            out["kobj"] = (
                optax.sigmoid_binary_cross_entropy(
                    pk[..., 2], vis.astype(jnp.float32)
                )
                * mask[:, None]
            ).sum() / wsum
        return out

    fn = per_image_tal if use_tal else per_image
    if has_kpt:
        losses = jax.vmap(fn)(box_logits, cls_logits, gt_boxes, gt_mask, kpt_raw, gt_kpts)
    else:
        losses = jax.vmap(fn)(box_logits, cls_logits, gt_boxes, gt_mask)
    losses = jax.tree.map(jnp.mean, losses)
    total = (
        box_weight * losses["box"]
        + cls_weight * losses["cls"]
        + dfl_weight * losses["dfl"]
    )
    if has_kpt:
        total = total + kpt_weight * losses["kpt"] + kobj_weight * losses["kobj"]
    return total, losses


def make_optimizer(
    lr: float = 1e-4, weight_decay: float = 0.0005, warmup_steps: int = 100
) -> optax.GradientTransformation:
    """AdamW matching the reference's training config
    (pipeline_v3_RTDETR/train_rtdetr.py:191-207: optimizer AdamW, lr0 1e-4)."""
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, 10_000, lr * 0.01)
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def make_train_step(model: YoloV11, tx: optax.GradientTransformation):
    """Single-device jitted train step. batch = (images [B,H,W,3],
    gt_boxes [B,M,4], gt_mask [B,M], gt_kpts [B,M,K,3] | None)."""

    def loss_fn(params, batch_stats, images, gt_boxes, gt_mask, gt_kpts):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        total, parts = yolo_loss(outs, gt_boxes, gt_mask, gt_kpts)
        return total, (parts, mutated["batch_stats"])

    @jax.jit
    def step(params, batch_stats, opt_state, images, gt_boxes, gt_mask, gt_kpts):
        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, gt_boxes, gt_mask, gt_kpts
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, parts

    return step


def make_staged_train_loop(
    model: YoloV11,
    tx: optax.GradientTransformation,
    steps_per_dispatch: int = 100,
    flip: bool = True,
):
    """Scan-on-device training: the staged dataset lives in HBM as uint8
    batches ``[N, B, H, W, 3]`` and each dispatch runs ``steps_per_dispatch``
    optimizer steps inside one ``lax.fori_loop`` — normalisation, per-sample
    horizontal-flip augmentation, grad, and update all on device.

    Over a remote/tunneled accelerator this removes the per-step host round
    trip and image upload entirely (measured 1.2 s/step host-driven vs
    device-bound once staged); on local chips it still kills dispatch
    overhead. The returned ``run(params, batch_stats, opt_state, images_u8,
    gt_boxes, gt_mask, gt_kpts, start, key)`` consumes batches round-robin
    from ``start`` and returns updated state + mean loss of the dispatch.
    With ``flip=False`` the result is step-for-step identical to calling
    ``make_train_step``'s step on the same batch sequence (tested)."""

    run = jax.jit(_staged_run_fn(model, tx, steps_per_dispatch, flip))
    return run


def _staged_run_fn(model, tx, steps_per_dispatch, flip, loss=None):
    """Un-jitted scan-on-device run body shared by the single-device and
    mesh-sharded staged loops. ``loss`` is the per-batch loss callable
    ``(outs, gt_boxes, gt_mask, gt_kpts) -> (total, parts)`` — defaults to
    ``yolo_loss``; the SCRFD staged loop injects ``scrfd_loss`` here."""
    loss = loss or yolo_loss

    def loss_fn(params, batch_stats, images, gt_boxes, gt_mask, gt_kpts):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        total, parts = loss(outs, gt_boxes, gt_mask, gt_kpts)
        return total, (parts, mutated["batch_stats"])

    def run(params, batch_stats, opt_state, images_u8, gt_boxes, gt_mask,
            gt_kpts, start, key):
        n_staged = images_u8.shape[0]
        width = images_u8.shape[3]

        def body(i, carry):
            params, bstats, opt_state, loss_sum = carry
            idx = (start + i) % n_staged
            img = jnp.take(images_u8, idx, axis=0).astype(jnp.float32) / 255.0
            bx = jnp.take(gt_boxes, idx, axis=0)
            mk = jnp.take(gt_mask, idx, axis=0)
            kp = jnp.take(gt_kpts, idx, axis=0)
            if flip:
                flips = jax.random.bernoulli(
                    jax.random.fold_in(key, i), shape=(img.shape[0],)
                )
                img = jnp.where(flips[:, None, None, None], img[:, :, ::-1, :], img)
                fb = jnp.stack(
                    [width - bx[..., 2], bx[..., 1], width - bx[..., 0], bx[..., 3]],
                    -1,
                )
                bx = jnp.where(flips[:, None, None], fb, bx)
                kpx = kp.at[..., 0].set(width - kp[..., 0])
                if kp.shape[-2] == 5:
                    # mirroring swaps left/right landmark semantics — permute
                    # [l_eye, r_eye, nose, l_mouth, r_mouth] -> [1,0,2,4,3]
                    # (reference/ultralytics flip_idx on fliplr)
                    kpx = kpx[..., jnp.array([1, 0, 2, 4, 3]), :]
                kp = jnp.where(flips[:, None, None, None], kpx, kp)
            # dead padded rows would flip to x1=x2=width garbage; re-zero them
            bx = bx * mk[..., None]
            kp = kp * mk[..., None, None]
            (loss, (_parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, bstats, img, bx, mk, kp)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state, loss_sum + loss)

        params, batch_stats, opt_state, loss_sum = jax.lax.fori_loop(
            0, steps_per_dispatch, body,
            (params, batch_stats, opt_state, jnp.float32(0.0)),
        )
        return params, batch_stats, opt_state, loss_sum / steps_per_dispatch

    return run


def make_sharded_staged_train_loop(
    model: YoloV11,
    tx: optax.GradientTransformation,
    mesh,
    steps_per_dispatch: int = 100,
    flip: bool = True,
    fsdp_axis: str = "tile",
):
    """Multi-chip scan-on-device training: the staged uint8 dataset's batch
    axis shards over ``dp`` (stage axis replicated so every device walks the
    same round-robin schedule), params/optimizer state FSDP-shard over
    ``fsdp_axis``, and XLA inserts the grad reduce-scatter/all-reduce inside
    the fori_loop — steps_per_dispatch fully-collective optimizer steps per
    dispatch with zero host involvement.

    Returns (jit_run, shard_state): ``shard_state(params, batch_stats,
    opt_state)`` places the train state per the plan; ``jit_run(params,
    batch_stats, opt_state)`` builds the jitted loop whose data arguments are
    the staged arrays + (start, key), like ``make_staged_train_loop``'s."""
    run = _staged_run_fn(model, tx, steps_per_dispatch, flip)

    def shard_state(params, batch_stats, opt_state):
        plans = _fsdp_state_plans(params, batch_stats, opt_state, mesh, fsdp_axis)
        return tuple(jax.device_put(x, p) for x, p in
                     zip((params, batch_stats, opt_state), plans))

    def jit_run(params, batch_stats, opt_state):
        p_plan, bs_plan, o_plan = _fsdp_state_plans(
            params, batch_stats, opt_state, mesh, fsdp_axis
        )
        data = lambda ndim: staged_sharding(mesh, ndim, "dp")
        return jax.jit(
            run,
            in_shardings=(
                p_plan, bs_plan, o_plan,
                data(5), data(4), data(3), data(5),
                None, None,
            ),
            out_shardings=(p_plan, bs_plan, o_plan, replicated(mesh)),
        )

    return jit_run, shard_state


def _fsdp_state_plans(params, batch_stats, opt_state, mesh, fsdp_axis):
    """(params, batch_stats, opt_state) sharding plan: FSDP params/opt over
    ``fsdp_axis``, batch stats replicated."""
    p_plan = fsdp_param_shardings(params, mesh, axis=fsdp_axis)
    bs_plan = jax.tree.map(lambda _: replicated(mesh), batch_stats)
    o_plan = jax.tree.map(
        lambda x: fsdp_param_shardings(x, mesh, axis=fsdp_axis)
        if hasattr(x, "ndim")
        else replicated(mesh),
        opt_state,
        is_leaf=lambda x: hasattr(x, "ndim"),
    )
    return p_plan, bs_plan, o_plan


def make_sharded_train_step(
    model: YoloV11, tx: optax.GradientTransformation, mesh, fsdp_axis: str = "tile"
):
    """Multi-chip train step: images/targets sharded over ``dp``, params and
    optimizer state FSDP-sharded over ``fsdp_axis``. Returns (step_fn,
    shard_fn) where shard_fn places (params, batch_stats, opt_state) on the
    mesh according to the plan."""

    def loss_fn(params, batch_stats, images, gt_boxes, gt_mask, gt_kpts):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        total, parts = yolo_loss(outs, gt_boxes, gt_mask, gt_kpts)
        return total, (parts, mutated["batch_stats"])

    def step(params, batch_stats, opt_state, images, gt_boxes, gt_mask, gt_kpts):
        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, gt_boxes, gt_mask, gt_kpts
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, parts

    def make_plans(params, batch_stats, opt_state):
        return _fsdp_state_plans(params, batch_stats, opt_state, mesh, fsdp_axis)

    def shard_state(params, batch_stats, opt_state):
        p_plan, bs_plan, o_plan = make_plans(params, batch_stats, opt_state)
        return (
            jax.device_put(params, p_plan),
            jax.device_put(batch_stats, bs_plan),
            jax.device_put(opt_state, o_plan),
        )

    def jit_step(params, batch_stats, opt_state):
        p_plan, bs_plan, o_plan = make_plans(params, batch_stats, opt_state)
        data = lambda ndim: batch_sharding(mesh, ndim, "dp")
        return jax.jit(
            step,
            in_shardings=(
                p_plan,
                bs_plan,
                o_plan,
                data(4),
                data(3),
                data(2),
                data(4),
            ),
            out_shardings=(p_plan, bs_plan, o_plan, replicated(mesh), None),
        )

    return jit_step, shard_state
