"""Fine-tune YOLOv11 on the reference-golden WIDERFACE images and score the
trained weights through the real sliced pipeline against the reference's own
detections.

This closes the accuracy loop on REAL data in a zero-egress environment: no
pretrained checkpoints can be downloaded, but the reference repo commits 16
actual WIDERFACE images together with its pipeline's detection artifacts
(temp_streamlit/<image>/crops — recovered into eval/assets/reference_goldens.json
by tools/reference_goldens.py). Training on the reference's detections and
replaying inference at its fixed operating point (640/0.25/IOS/0.5 —
reference: pipeline_v4_yolo/1_Inference.py:563-566) exercises every stage the
reference exercises: data -> TAL/DFL training -> checkpoint -> sliced
inference -> merge -> box agreement.

Honesty note: 16 images cannot prove WIDERFACE-scale generalisation. The
train-split parity numbers demonstrate the *pipeline* (can the stack fit real
faces and recover them through slicing+merge); the held-out split is a small
but genuine generalisation smoke. Both are reported separately.

Run (TPU): python -m facedet_tpu.tools.golden_finetune --steps 800
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

GOLDENS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "eval", "assets", "reference_goldens.json",
)
REF_DIR = "/root/reference"


def load_golden_dataset(
    goldens_path: str = GOLDENS_PATH, ref_dir: str = REF_DIR
) -> list[dict]:
    """[{name, image uint8 [H,W,3], boxes float32 [N,4] xyxy}] for every
    golden image whose source file exists."""
    from facedet_tpu.data.native_loader import load_image

    with open(goldens_path) as f:
        goldens = json.load(f)
    records = []
    for name, rec in sorted(goldens["images"].items()):
        src = os.path.join(ref_dir, name, "temp_sahi_input.jpg")
        if not os.path.exists(src):
            continue
        boxes = np.array([f["bbox"] for f in rec["faces"]], np.float32).reshape(-1, 4)
        records.append({"name": name, "image": load_image(src), "boxes": boxes})
    return records


def split_records(records: list[dict], holdout_every: int = 4):
    """Deterministic train/held-out split: every ``holdout_every``-th record
    (sorted by name) is held out — 12 train / 4 held-out on the full set."""
    train = [r for i, r in enumerate(records) if i % holdout_every != holdout_every - 1]
    held = [r for i, r in enumerate(records) if i % holdout_every == holdout_every - 1]
    return train, held


def _remap_boxes(
    boxes: np.ndarray, x0: float, y0: float, win: float, out: int,
    min_visible: float = 0.4, min_px: float = 3.0,
) -> np.ndarray:
    """Shift boxes into a window at (x0,y0) of size ``win``, scale to ``out``,
    clip, and drop boxes with <``min_visible`` of their area left visible."""
    if len(boxes) == 0:
        return boxes.reshape(0, 4)
    b = boxes - np.array([x0, y0, x0, y0], np.float32)
    area = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    c = np.clip(b, 0, win)
    c_area = np.maximum(c[:, 2] - c[:, 0], 0) * np.maximum(c[:, 3] - c[:, 1], 0)
    keep = c_area >= min_visible * np.maximum(area, 1e-9)
    c = c[keep] * (out / win)
    wh = c[:, 2:] - c[:, :2]
    return c[(wh[:, 0] >= min_px) & (wh[:, 1] >= min_px)]


def sample_crop(
    rec: dict, rng: np.random.Generator, out: int = 640,
    scale_range: tuple[float, float] = (0.6, 1.6), max_boxes: int = 64,
):
    """One training example: a face-anchored random window resized to
    ``out`` x ``out`` (PIL bilinear), boxes remapped, random h-flip."""
    from PIL import Image

    img, boxes = rec["image"], rec["boxes"]
    h, w = img.shape[:2]
    win = int(out * rng.uniform(*scale_range))
    win = min(win, h, w)
    if len(boxes):
        fx1, fy1, fx2, fy2 = boxes[rng.integers(len(boxes))]
        cx = (fx1 + fx2) / 2 + rng.uniform(-0.3, 0.3) * win
        cy = (fy1 + fy2) / 2 + rng.uniform(-0.3, 0.3) * win
    else:
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
    x0 = int(np.clip(cx - win / 2, 0, w - win))
    y0 = int(np.clip(cy - win / 2, 0, h - win))
    crop = img[y0 : y0 + win, x0 : x0 + win]
    if win != out:
        crop = np.asarray(
            Image.fromarray(crop).resize((out, out), Image.BILINEAR)
        )
    b = _remap_boxes(boxes, x0, y0, win, out)
    if rng.random() < 0.5:
        crop = crop[:, ::-1]
        b = np.stack([out - b[:, 2], b[:, 1], out - b[:, 0], b[:, 3]], -1) if len(b) else b
    b = b[:max_boxes]
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_mask = np.zeros((max_boxes,), bool)
    out_boxes[: len(b)] = b
    out_mask[: len(b)] = True
    # uint8 crops: the tunneled TPU link is bandwidth-bound, so batches ship
    # at 1 B/px and are normalised on device (see main's to_f32)
    return np.ascontiguousarray(crop), out_boxes, out_mask


def sample_mosaic(records, rng, out: int, max_boxes: int):
    """4-quadrant mosaic of independent face-anchored crops (the reference
    trains with mosaic=1.0, pipeline_v3_RTDETR/train_rtdetr.py:191-207) —
    multiplies scene diversity on tiny datasets."""
    half = out // 2
    canvas = np.zeros((out, out, 3), np.uint8)
    acc = []
    for oy, ox in ((0, 0), (0, half), (half, 0), (half, half)):
        rec = records[rng.integers(len(records))]
        img, b, m = sample_crop(rec, rng, out=half, max_boxes=max_boxes)
        canvas[oy : oy + half, ox : ox + half] = img
        if m.any():
            acc.append(b[m] + np.array([ox, oy, ox, oy], np.float32))
    b = (np.concatenate(acc) if acc else np.zeros((0, 4), np.float32))[:max_boxes]
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_mask = np.zeros((max_boxes,), bool)
    out_boxes[: len(b)] = b
    out_mask[: len(b)] = True
    return canvas, out_boxes, out_mask


def _photometric_jitter(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Cheap brightness/contrast/channel-gain jitter (stand-in for the
    reference's HSV jitter) applied to a uint8 crop."""
    gain = rng.uniform(0.75, 1.25, 3).astype(np.float32)
    bias = rng.uniform(-20, 20)
    return np.clip(img.astype(np.float32) * gain + bias, 0, 255).astype(np.uint8)


def sample_batch(records, rng, batch: int, out: int = 640, max_boxes: int = 64,
                 mosaic_prob: float = 0.0, jitter: bool = False):
    ims, bxs, mks = [], [], []
    for _ in range(batch):
        if mosaic_prob and rng.random() < mosaic_prob:
            img, b, m = sample_mosaic(records, rng, out, max_boxes)
        else:
            img, b, m = sample_crop(
                records[rng.integers(len(records))], rng, out=out,
                max_boxes=max_boxes,
            )
        if jitter:
            img = _photometric_jitter(img, rng)
        ims.append(img)
        bxs.append(b)
        mks.append(m)
    return np.stack(ims), np.stack(bxs), np.stack(mks)


def parity_on_split(detection_model, goldens: dict, records: list[dict],
                    ref_dir: str, conf: float, iou: float) -> dict:
    from facedet_tpu.eval.reference_parity import run_parity

    names = {r["name"] for r in records}
    subset = {
        "images": {k: v for k, v in goldens["images"].items() if k in names}
    }
    return run_parity(subset, ref_dir, detection_model, conf=conf, iou_thr=iou)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--lr", type=float, default=None,
                    help="default: 2e-3 for yolo, 4e-4 for rtdetr")
    ap.add_argument("--scale", default="n")
    ap.add_argument("--conf", type=float, default=0.35)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--goldens", default=GOLDENS_PATH)
    ap.add_argument("--ref-dir", default=REF_DIR)
    ap.add_argument("--out-dir", default="runs/golden_finetune")
    ap.add_argument("--max-parity-images", type=int, default=0,
                    help="cap each parity split to N images (0 = all; for smokes)")
    ap.add_argument("--staged", type=int, default=0,
                    help="pre-stage N uint8 batches in HBM and train with the "
                    "scan-on-device loop (no per-step host round trip); 0 = "
                    "host-driven per-step feeding")
    ap.add_argument("--steps-per-dispatch", type=int, default=100)
    ap.add_argument("--mosaic-prob", type=float, default=0.4,
                    help="probability of a 4-quadrant mosaic sample (yolo path)")
    ap.add_argument("--no-jitter", action="store_true",
                    help="disable photometric jitter (yolo path)")
    ap.add_argument("--model", choices=("yolo", "rtdetr"), default="yolo",
                    help="rtdetr = pipeline-v3 analog: CDN-trained RT-DETR "
                    "on the golden images (staged loop only)")
    ap.add_argument("--variant", default="rtdetr-m",
                    help="RTDETR_VARIANTS key for --model rtdetr")
    ap.add_argument("--dn-groups", type=int, default=3)
    ap.add_argument("--pretrain-steps", type=int, default=0,
                    help="rtdetr: synthetic dense-blob pretrain steps before "
                    "the golden fine-tune (pretrained-init stand-in)")
    args = ap.parse_args(argv)
    if args.model == "rtdetr":
        return main_rtdetr(args)
    if args.lr is None:
        args.lr = 2e-3

    import jax
    import jax.numpy as jnp
    import optax

    from facedet_tpu.engine.detector import (
        YoloV11PoseDetectionModel, save_params_npz,
    )
    from facedet_tpu.models.yolov11 import YoloConfig, YoloV11
    from facedet_tpu.train.yolo_train import make_train_step
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    records = load_golden_dataset(args.goldens, args.ref_dir)
    if not records:
        raise SystemExit(f"no golden source images under {args.ref_dir}")
    train_recs, held_recs = split_records(records)
    n_faces = sum(len(r["boxes"]) for r in records)
    print(f"{len(records)} golden images / {n_faces} faces "
          f"({len(train_recs)} train, {len(held_recs)} held out)")

    cfg = YoloConfig(scale=args.scale, num_classes=1, with_pose=True)
    model = YoloV11(cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)),
            train=False,
        )
    params, batch_stats = variables["params"], variables["batch_stats"]
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(100, args.steps // 10), args.steps, args.lr * 0.01
    )
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=5e-4))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    rng = np.random.default_rng(0)
    max_boxes = 64
    t0 = time.perf_counter()
    if args.staged:
        # scan-on-device: stage the whole (augmented-crop) dataset in HBM as
        # uint8 once, then each dispatch runs steps_per_dispatch optimizer
        # steps inside one lax.fori_loop with on-device flips — the tunneled
        # link pays one upload instead of one RTT + 10 MB per step
        from facedet_tpu.train.yolo_train import make_staged_train_loop

        batches = [
            sample_batch(train_recs, rng, args.batch, args.size, max_boxes,
                         mosaic_prob=args.mosaic_prob, jitter=not args.no_jitter)
            for _ in range(args.staged)
        ]
        s_ims = jnp.asarray(np.stack([b[0] for b in batches]))
        s_bxs = jnp.asarray(np.stack([b[1] for b in batches]))
        s_mks = jnp.asarray(np.stack([b[2] for b in batches]))
        s_kps = jnp.zeros((args.staged, args.batch, max_boxes, 5, 3))
        jax.block_until_ready((s_ims, s_bxs, s_mks))
        print(f"staged {args.staged} batches "
              f"({s_ims.nbytes / 1e6:.0f} MB uint8) in "
              f"{time.perf_counter() - t0:.1f}s")
        spd = min(args.steps_per_dispatch, args.steps)
        run = make_staged_train_loop(model, tx, steps_per_dispatch=spd)
        key = jax.random.PRNGKey(3)
        done = 0
        while done < args.steps:
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, mean_loss = run(
                params, batch_stats, opt_state,
                s_ims, s_bxs, s_mks, s_kps, done, sub,
            )
            done += spd
            print(f"step {done}: mean loss {float(mean_loss):.4f}")
    else:
        kpts = jnp.zeros((args.batch, max_boxes, 5, 3))
        to_f32 = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)
        for it in range(args.steps):
            ims, bxs, mks = sample_batch(
                train_recs, rng, args.batch, args.size, max_boxes,
                mosaic_prob=args.mosaic_prob, jitter=not args.no_jitter,
            )
            params, batch_stats, opt_state, loss, _ = step(
                params, batch_stats, opt_state,
                to_f32(jnp.asarray(ims)), jnp.asarray(bxs), jnp.asarray(mks), kpts,
            )
            if it % 100 == 0 or it == args.steps - 1:
                print(f"step {it}: loss {float(loss):.4f}")
    train_s = time.perf_counter() - t0
    print(f"trained {args.steps} steps in {train_s:.1f}s")

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt = os.path.join(args.out_dir, f"yolo11{args.scale}_golden.npz")
    save_params_npz(ckpt, {"params": params, "batch_stats": batch_stats})
    print(f"saved {ckpt}")

    det = YoloV11PoseDetectionModel(
        scale=args.scale, dtype="bfloat16", confidence_threshold=0.25,
        image_size=args.size, load_at_init=False,
    )
    det.cfg = cfg
    det.model = model
    det.variables = {"params": params, "batch_stats": batch_stats}

    with open(args.goldens) as f:
        goldens = json.load(f)
    cap = args.max_parity_images or None
    report = {
        "steps": args.steps, "train_seconds": round(train_s, 1),
        "checkpoint": ckpt,
        "train_split": parity_on_split(
            det, goldens, train_recs[:cap], args.ref_dir, args.conf, args.iou),
        "held_out_split": parity_on_split(
            det, goldens, held_recs[:cap], args.ref_dir, args.conf, args.iou),
    }
    for split in ("train_split", "held_out_split"):
        r = report[split]
        rec = "n/a" if r["recall"] is None else f"{r['recall']:.3f}"
        prec = "n/a" if r["precision"] is None else f"{r['precision']:.3f}"
        print(f"{split}: recall {rec} precision {prec}"
              f" (conf>={args.conf}, IoU>={args.iou})")
    out = os.path.join(args.out_dir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return report


def _xyxy_to_norm_cxcywh(xyxy: np.ndarray, size: float) -> np.ndarray:
    """Pixel xyxy [..., 4] -> normalized cxcywh for the DETR losses."""
    return np.stack(
        [
            (xyxy[..., 0] + xyxy[..., 2]) / 2 / size,
            (xyxy[..., 1] + xyxy[..., 3]) / 2 / size,
            (xyxy[..., 2] - xyxy[..., 0]) / size,
            (xyxy[..., 3] - xyxy[..., 1]) / size,
        ],
        -1,
    ).astype(np.float32)


def make_dense_blob_batches(
    n_batches: int, batch: int, size: int, max_boxes: int,
    rng: np.random.Generator,
):
    """Synthetic dense-crowd pretraining batches shaped like the golden crop
    batches: uint8 images with 8-64px bright ellipse 'faces' on textured
    background, up to ``max_boxes`` per image, plus pixel-xyxy GT."""
    yy, xx = np.mgrid[0:size, 0:size]
    ims = np.zeros((n_batches, batch, size, size, 3), np.uint8)
    bxs = np.zeros((n_batches, batch, max_boxes, 4), np.float32)
    mks = np.zeros((n_batches, batch, max_boxes), bool)
    for n in range(n_batches):
        for b in range(batch):
            img = rng.uniform(0, 64, (size, size, 3)).astype(np.float32)
            k = int(rng.integers(4, max_boxes))
            for j in range(k):
                rx = int(rng.integers(4, 32))
                ry = int(rx * rng.uniform(1.1, 1.5))
                cx = int(rng.integers(rx + 1, size - rx - 1))
                cy = int(rng.integers(ry + 1, size - ry - 1))
                m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
                img[m] = rng.uniform(120, 255, 3)
                bxs[n, b, j] = [cx - rx, cy - ry, cx + rx, cy + ry]
                mks[n, b, j] = True
            ims[n, b] = img.astype(np.uint8)
    return ims, bxs, mks


def main_rtdetr(args):
    """RT-DETR on the golden WIDERFACE images — the real-data analog of the
    reference's pipeline v3 fine-tune (pipeline_v3_RTDETR/train_rtdetr.py:162:
    it trains RT-DETR on WIDERFACE); from scratch with contrastive denoising
    since pretrained checkpoints are unreachable here. Staged scan-on-device
    loop only. ``--pretrain-steps`` prepends a synthetic dense-blob
    localisation pretrain — the zero-egress stand-in for the reference's
    COCO-pretrained initialisation (DETRs are known not to converge from
    scratch on small dense data in small step budgets)."""
    import jax
    import jax.numpy as jnp
    import optax

    from facedet_tpu.engine.detector import save_params_npz
    from facedet_tpu.engine.rtdetr_wrapper import RtDetrDetectionModel
    from facedet_tpu.models.rtdetr import RTDETR_VARIANTS, RtDetr
    from facedet_tpu.train.rtdetr_train import make_staged_rtdetr_loop
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    records = load_golden_dataset(args.goldens, args.ref_dir)
    if not records:
        raise SystemExit(f"no golden source images under {args.ref_dir}")
    train_recs, held_recs = split_records(records)
    print(f"{len(records)} golden images ({len(train_recs)} train, "
          f"{len(held_recs)} held out)")

    variant = args.variant
    cfg = RTDETR_VARIANTS[variant]
    # keep GT capacity under the tiny variant's 60 queries
    max_boxes = min(48, cfg.num_queries)
    model = RtDetr(cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)),
            train=False,
        )
    params, batch_stats = variables["params"], variables["batch_stats"]
    lr = 4e-4 if args.lr is None else args.lr  # DETR-appropriate default
    total_steps = args.steps + args.pretrain_steps
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, min(100, total_steps // 10), total_steps, lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(0.1),
                     optax.adamw(sched, weight_decay=1e-4))
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    n_staged = args.staged or 64
    t0 = time.perf_counter()
    batches = [
        sample_batch(train_recs, rng, args.batch, args.size, max_boxes)
        for _ in range(n_staged)
    ]
    s = float(args.size)
    xyxy = np.stack([b[1] for b in batches])  # [N,B,M,4] pixel xyxy
    cxcywh = _xyxy_to_norm_cxcywh(xyxy, s)
    s_ims = jnp.asarray(np.stack([b[0] for b in batches]))
    s_bxs = jnp.asarray(cxcywh)
    s_mks = jnp.asarray(np.stack([b[2] for b in batches]))
    jax.block_until_ready((s_ims, s_bxs, s_mks))
    print(f"staged {n_staged} batches ({s_ims.nbytes / 1e6:.0f} MB uint8) "
          f"in {time.perf_counter() - t0:.1f}s")

    spd = min(args.steps_per_dispatch, args.steps)
    run = make_staged_rtdetr_loop(model, tx, steps_per_dispatch=spd,
                                  dn_groups=args.dn_groups)
    key = jax.random.PRNGKey(3)
    if args.pretrain_steps:
        # identical staged shapes -> the jitted loop is compiled once and
        # shared between the pretrain and fine-tune phases
        pt_ims, pt_xyxy, pt_mks = make_dense_blob_batches(
            n_staged, args.batch, args.size, max_boxes,
            np.random.default_rng(11),
        )
        pt_cxcywh = _xyxy_to_norm_cxcywh(pt_xyxy, s)
        p_ims = jnp.asarray(pt_ims)
        p_bxs = jnp.asarray(pt_cxcywh)
        p_mks = jnp.asarray(pt_mks)
        done = 0
        while done < args.pretrain_steps:
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, mean_loss = run(
                params, batch_stats, opt_state, p_ims, p_bxs, p_mks, done, sub,
            )
            done += spd
            print(f"pretrain step {done}: mean loss {float(mean_loss):.4f}")
    done = 0
    while done < args.steps:
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, mean_loss = run(
            params, batch_stats, opt_state, s_ims, s_bxs, s_mks, done, sub,
        )
        done += spd
        print(f"step {done}: mean loss {float(mean_loss):.4f}")
    train_s = time.perf_counter() - t0
    print(f"trained {args.steps} steps in {train_s:.1f}s")

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt = os.path.join(args.out_dir, f"{variant}_golden.npz")
    save_params_npz(ckpt, {"params": params, "batch_stats": batch_stats})
    print(f"saved {ckpt}")

    # DETR focal-loss confidences run low (reference validates at 0.001 via
    # model.val); score the parity gate at an inclusive operating threshold
    det = RtDetrDetectionModel(
        variant=variant, dtype="float32", confidence_threshold=0.05,
        image_size=args.size, load_at_init=False,
    )
    det.cfg = cfg
    det.model = model
    det.variables = {"params": params, "batch_stats": batch_stats}

    with open(args.goldens) as f:
        goldens = json.load(f)
    cap = args.max_parity_images or None
    conf = min(args.conf, 0.2)
    report = {
        "model": variant, "steps": args.steps,
        "train_seconds": round(train_s, 1), "checkpoint": ckpt,
        "train_split": parity_on_split(
            det, goldens, train_recs[:cap], args.ref_dir, conf, args.iou),
        "held_out_split": parity_on_split(
            det, goldens, held_recs[:cap], args.ref_dir, conf, args.iou),
    }
    for split in ("train_split", "held_out_split"):
        r = report[split]
        rec = "n/a" if r["recall"] is None else f"{r['recall']:.3f}"
        prec = "n/a" if r["precision"] is None else f"{r['precision']:.3f}"
        print(f"{split}: recall {rec} precision {prec}"
              f" (conf>={conf}, IoU>={args.iou})")
    out = os.path.join(args.out_dir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return report


if __name__ == "__main__":
    main()
