"""SCRFD training: task-aligned assignment + IoU/BCE/keypoint losses.

The reference never trains its SCRFD/RetinaFace arm — it runs pretrained
insightface ONNX graphs through onnxruntime (utils/insightface_wrapper.py:38-60).
Zero egress blocks those weights, so this module supplies the training loop
the rebuild needs for learning proof (VERDICT r3 #5): the same task-aligned
assignment scheme as the YOLO arm (train/yolo_train.tal_assign — published TAL;
SCRFD's own ATSS serves the identical role of scoring anchor/GT alignment),
with SCRFD's head conventions: per-center ltrb distances in stride units
(models/scrfd.py::decode_scrfd), sigmoid cls, keypoint offsets from centers.

All shapes static, vmapped per image — one jitted step, BatchNorm mutated
in-step like the YOLO trainer.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from facedet_tpu.models.scrfd import NUM_ANCHORS, STRIDES
from facedet_tpu.train.yolo_train import _iou_xyxy, tal_assign

__all__ = ["scrfd_loss", "make_scrfd_train_step", "make_scrfd_staged_loop"]


def _flat_centers(level_shapes: list[tuple[int, int]]):
    """Anchor centers [A,2] (px) + per-anchor stride [A], anchor-fastest to
    match decode_scrfd's reshape order."""
    centers, strides = [], []
    for (h, w), s in zip(level_shapes, STRIDES):
        ys = jnp.arange(h, dtype=jnp.float32) * s
        xs = jnp.arange(w, dtype=jnp.float32) * s
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        c = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)
        c = jnp.repeat(c, NUM_ANCHORS, axis=0)
        centers.append(c)
        strides.append(jnp.full((h * w * NUM_ANCHORS,), float(s)))
    return jnp.concatenate(centers), jnp.concatenate(strides)


def scrfd_loss(
    level_outputs: list[dict],
    gt_boxes: jax.Array,  # [B, M, 4] xyxy px
    gt_mask: jax.Array,  # [B, M] bool
    gt_kpts: Optional[jax.Array] = None,  # [B, M, K, 3]
    box_weight: float = 2.0,
    cls_weight: float = 1.0,
    kps_weight: float = 0.1,
) -> tuple[jax.Array, dict]:
    level_shapes = [(lvl["cls"].shape[1], lvl["cls"].shape[2]) for lvl in level_outputs]
    centers, strides = _flat_centers(level_shapes)
    a_total = centers.shape[0]
    b = level_outputs[0]["cls"].shape[0]

    cls_logits = jnp.concatenate(
        [lvl["cls"].reshape(b, -1, 1) for lvl in level_outputs], axis=1
    )
    dists = jnp.concatenate(
        [
            lvl["box"].reshape(b, -1, 4) * s
            for lvl, s in zip(level_outputs, STRIDES)
        ],
        axis=1,
    )
    has_kpt = gt_kpts is not None and "kps" in level_outputs[0]
    if has_kpt:
        k = gt_kpts.shape[-2]
        kps_raw = jnp.concatenate(
            [
                lvl["kps"].reshape(b, -1, k, 2) * s
                for lvl, s in zip(level_outputs, STRIDES)
            ],
            axis=1,
        )

    def per_image(cls_lg, dist, boxes, mask, kps=None, kp_gt=None):
        pred_boxes = jnp.concatenate(
            [centers - dist[:, :2], centers + dist[:, 2:]], axis=-1
        )
        pred_scores = jax.nn.sigmoid(cls_lg)  # [A,1]
        fg, best_gt, norm_align = tal_assign(
            centers,
            jax.lax.stop_gradient(pred_boxes),
            jax.lax.stop_gradient(pred_scores),
            boxes,
            mask,
        )
        tgt_boxes = boxes[best_gt]
        wsum = jnp.maximum(norm_align.sum(), 1.0)
        iou = _iou_xyxy(pred_boxes, tgt_boxes)
        box_l = (jnp.where(fg, (1.0 - iou) * norm_align, 0.0)).sum() / wsum
        tgt = jnp.where(fg, norm_align, 0.0)[:, None]
        cls_l = optax.sigmoid_binary_cross_entropy(cls_lg, tgt).sum() / wsum
        out = {"box": box_l, "cls": cls_l}
        if kps is not None:
            tgt_kp = kp_gt[best_gt]  # [A,K,3]
            pred_xy = centers[:, None, :] + kps  # [A,K,2]
            vis = (tgt_kp[..., 2] > 0) & fg[:, None]
            kw = jnp.maximum(vis.sum(), 1)
            # SCRFD normalises keypoint regression by the anchor stride
            l1 = (
                jnp.abs(pred_xy - tgt_kp[..., :2]).sum(-1)
                / strides[:, None]
            )
            out["kps"] = (l1 * vis).sum() / kw
        return out

    if has_kpt:
        losses = jax.vmap(per_image)(cls_logits, dists, gt_boxes, gt_mask, kps_raw, gt_kpts)
    else:
        losses = jax.vmap(per_image)(cls_logits, dists, gt_boxes, gt_mask)
    losses = jax.tree.map(jnp.mean, losses)
    total = box_weight * losses["box"] + cls_weight * losses["cls"]
    if has_kpt:
        total = total + kps_weight * losses["kps"]
    return total, losses


def make_scrfd_train_step(model, tx: optax.GradientTransformation):
    """Jitted step: (params, batch_stats, opt_state, images [B,H,W,3] f32 in
    [0,1], gt_boxes, gt_mask, gt_kpts) -> (params, batch_stats, opt_state,
    loss, parts). Pass gt_kpts=None at trace time to train box/cls only."""

    def loss_fn(params, batch_stats, images, gt_boxes, gt_mask, gt_kpts):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        total, parts = scrfd_loss(outs, gt_boxes, gt_mask, gt_kpts)
        return total, (parts, mutated["batch_stats"])

    @jax.jit
    def step(params, batch_stats, opt_state, images, gt_boxes, gt_mask, gt_kpts=None):
        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, gt_boxes, gt_mask, gt_kpts
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, parts

    return step


def make_scrfd_staged_loop(
    model,
    tx: optax.GradientTransformation,
    steps_per_dispatch: int = 100,
    flip: bool = True,
):
    """Scan-on-device SCRFD training: ``steps_per_dispatch`` optimizer steps
    per dispatch over HBM-resident uint8 batches, with the same on-device
    h-flip augmentation (5-kpt left/right permute included) as the YOLO
    staged loop — it IS the YOLO loop body with ``scrfd_loss`` injected
    (train/yolo_train.py::_staged_run_fn), so the golden fine-tune's
    host-RTT economics (CLAUDE.md: ~1.2 s/step host-fed) carry over.

    Returned ``run(params, batch_stats, opt_state, images_u8, gt_boxes,
    gt_mask, gt_kpts, start, key)`` matches ``make_staged_train_loop``'s."""
    from facedet_tpu.train.yolo_train import _staged_run_fn

    return jax.jit(_staged_run_fn(model, tx, steps_per_dispatch, flip,
                                  loss=scrfd_loss))
