"""Per-layer device-time bisect of the YOLOv11 forward.

profile_stages.py showed the detector convs stage dominates the fused
pipeline (4.6 of 7.8 ms/img) at ~28 TFLOP/s effective — far below what
isolated conv probes reach on the same chip (160-215 TOP/s at 128+ channels).
This tool times truncated copies of the Backbone/PanNeck/DetectHead forward
(same layer names, so the real variables apply) with the K-difference method
to attribute device time to individual layers.

Run on the real TPU: python -m facedet_tpu.tools.profile_layers
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from facedet_tpu.models.layers import C2PSA, C3k2, ConvBnAct, SPPF, upsample2x
from facedet_tpu.models.yolov11 import DetectHead, YoloConfig

BACKBONE_STEPS = [
    "stem", "down1", "c3k2_0", "down2", "c3k2_1", "down3", "c3k2_2",
    "down4", "c3k2_3", "sppf", "c2psa",
]
NECK_STEPS = ["up0", "up1", "pan_down0", "pan0", "pan_down1", "pan1"]
HEAD_STEPS = ["head_box", "head_cls", "head_kpt"]
STEPS = [f"backbone/{s}" for s in BACKBONE_STEPS] + [
    f"neck/{s}" for s in NECK_STEPS
] + HEAD_STEPS


class TruncatedYolo(nn.Module):
    """Mirror of Backbone+PanNeck+DetectHead __call__ with an early stop.

    Layer names match models/yolov11.py exactly so the production variables
    apply unchanged; must be kept in sync with that file.
    """

    cfg: YoloConfig
    stop_at: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        c = cfg.ch
        stop = self.stop_at

        def done(name, *tensors):
            return stop == name

        x = x.astype(dt)
        outs = {}

        class _Scope(nn.Module):
            pass

        # -- backbone (names under "backbone/")
        def backbone(mdl, x):
            seq = []
            x = ConvBnAct(c(64), 3, 2, dtype=dt, name="stem")(x, train)
            seq.append(("stem", x))
            x = ConvBnAct(c(128), 3, 2, dtype=dt, name="down1")(x, train)
            seq.append(("down1", x))
            x = C3k2(c(256), cfg.depth(2), c3k=False, expansion=0.25, dtype=dt,
                     name="c3k2_0")(x, train)
            seq.append(("c3k2_0", x))
            x = ConvBnAct(c(256), 3, 2, dtype=dt, name="down2")(x, train)
            seq.append(("down2", x))
            p3 = C3k2(c(512), cfg.depth(2), c3k=False, expansion=0.25, dtype=dt,
                      name="c3k2_1")(x, train)
            seq.append(("c3k2_1", p3))
            x = ConvBnAct(c(512), 3, 2, dtype=dt, name="down3")(p3, train)
            seq.append(("down3", x))
            p4 = C3k2(c(512), cfg.depth(2), c3k=True, dtype=dt, name="c3k2_2")(x, train)
            seq.append(("c3k2_2", p4))
            x = ConvBnAct(c(1024), 3, 2, dtype=dt, name="down4")(p4, train)
            seq.append(("down4", x))
            x = C3k2(c(1024), cfg.depth(2), c3k=True, dtype=dt, name="c3k2_3")(x, train)
            seq.append(("c3k2_3", x))
            x = SPPF(c(1024), 5, dtype=dt, name="sppf")(x, train)
            seq.append(("sppf", x))
            p5 = C2PSA(c(1024), cfg.depth(2), dtype=dt, name="c2psa")(x, train)
            seq.append(("c2psa", p5))
            return seq, (p3, p4, p5)

        class BackboneT(nn.Module):
            @nn.compact
            def __call__(self, x):
                return backbone(self, x)

        seq, feats = BackboneT(name="backbone")(x)
        for name, t in seq:
            if stop == f"backbone/{name}":
                return t

        def neck(x3, x4, x5):
            seq = []
            y = jnp.concatenate([upsample2x(x5), x4], axis=-1)
            n4 = C3k2(c(512), cfg.depth(2), c3k=cfg.scale in ("l", "x", "m"),
                      dtype=dt, name="up0")(y, train)
            seq.append(("up0", n4))
            y = jnp.concatenate([upsample2x(n4), x3], axis=-1)
            n3 = C3k2(c(256), cfg.depth(2), c3k=cfg.scale in ("l", "x", "m"),
                      dtype=dt, name="up1")(y, train)
            seq.append(("up1", n3))
            y = ConvBnAct(c(256), 3, 2, dtype=dt, name="down0")(n3, train)
            seq.append(("pan_down0", y))
            y = jnp.concatenate([y, n4], axis=-1)
            m4 = C3k2(c(512), cfg.depth(2), c3k=cfg.scale in ("l", "x", "m"),
                      dtype=dt, name="pan0")(y, train)
            seq.append(("pan0", m4))
            y = ConvBnAct(c(512), 3, 2, dtype=dt, name="down1")(m4, train)
            seq.append(("pan_down1", y))
            y = jnp.concatenate([y, x5], axis=-1)
            m5 = C3k2(c(1024), cfg.depth(2), c3k=True, dtype=dt, name="pan1")(y, train)
            seq.append(("pan1", m5))
            return seq, (n3, m4, m5)

        class NeckT(nn.Module):
            @nn.compact
            def __call__(self, feats):
                return neck(*feats)

        seq, feats = NeckT(name="neck")(feats)
        for name, t in seq:
            if stop == f"neck/{name}":
                return t

        # -- head, branch-by-branch (names under "head/")
        from facedet_tpu.models.yolov11 import REG_MAX

        def head(mdl, feats, branches):
            cfg_ = cfg
            chans = [f.shape[-1] for f in feats]
            c2 = max(16, chans[0] // 4, REG_MAX * 4)
            c3 = max(chans[0], min(cfg_.num_classes, 100))
            nk = cfg_.num_keypoints * cfg_.kpt_dims
            c4 = max(chans[0] // 4, nk)
            outs = []
            for i, f in enumerate(feats):
                if "box" in branches:
                    box = ConvBnAct(c2, 3, dtype=dt, name=f"box{i}_0")(f, train)
                    box = ConvBnAct(c2, 3, dtype=dt, name=f"box{i}_1")(box, train)
                    box = nn.Conv(4 * REG_MAX, (1, 1), dtype=dt, name=f"box{i}_2")(box)
                    outs.append(box)
                if "cls" in branches:
                    cls = ConvBnAct(f.shape[-1], 3, groups=f.shape[-1], dtype=dt,
                                    name=f"cls{i}_dw0")(f, train)
                    cls = ConvBnAct(c3, 1, dtype=dt, name=f"cls{i}_pw0")(cls, train)
                    cls = ConvBnAct(c3, 3, groups=c3, dtype=dt, name=f"cls{i}_dw1")(cls, train)
                    cls = ConvBnAct(c3, 1, dtype=dt, name=f"cls{i}_pw1")(cls, train)
                    cls = nn.Conv(cfg_.num_classes, (1, 1), dtype=dt, name=f"cls{i}_out")(cls)
                    outs.append(cls)
                if "kpt" in branches:
                    kpt = ConvBnAct(c4, 3, dtype=dt, name=f"kpt{i}_0")(f, train)
                    kpt = ConvBnAct(c4, 3, dtype=dt, name=f"kpt{i}_1")(kpt, train)
                    kpt = nn.Conv(nk, (1, 1), dtype=dt, name=f"kpt{i}_2")(kpt)
                    outs.append(kpt)
            return outs

        branches = {"head_box": ("box",), "head_cls": ("box", "cls"),
                    "head_kpt": ("box", "cls", "kpt")}[stop]

        class HeadT(nn.Module):
            @nn.compact
            def __call__(self, feats):
                return head(self, feats, branches)

        return HeadT(name="head")(feats)


def main(tiles: int = 42, size: int = 640, k: int = 9, rounds: int = 5):
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel
    from facedet_tpu.engine import predict as P

    model = YoloV11PoseDetectionModel(
        scale="s", dtype="bfloat16", confidence_threshold=0.25,
        image_size=size, max_detections_per_tile=300,
    )
    variables = P._resident_variables(model)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.random((tiles, size, size, 3), np.float32))
    )
    jax.block_until_ready(x)

    results = {}
    for stop in STEPS:
        net = TruncatedYolo(model.model.cfg, stop)

        @jax.jit
        def rep(n, variables, x, net=net):
            def body(i, acc):
                xi = x.at[0, 0, 0, 0].set((i % 101).astype(x.dtype) / 101.0)
                out = net.apply(variables, xi, train=False)
                return acc + sum(
                    jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out)
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def timed(n):
            t0 = time.perf_counter()
            float(rep(n, variables, x))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        try:
            timed(1)
        except Exception as e:
            print(f"{stop:20s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
            results[stop] = float("nan")
            continue
        compile_s = time.perf_counter() - t0
        diffs = sorted(
            d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds))
            if d > 0
        )
        ms = (diffs[len(diffs) // 2] / tiles * 1e3) if diffs else float("nan")
        results[stop] = ms
        print(f"{stop:20s} cum {ms:8.4f} ms/tile  (compile {compile_s:.1f}s)", flush=True)

    print("\n-- marginal ms/tile")
    prev = 0.0
    for stop in STEPS:
        cur = results[stop]
        print(f"{stop:20s} {cur - prev:8.4f}")
        if cur == cur:  # skip NaN
            prev = cur


if __name__ == "__main__":
    main()
