"""FaceEnhancer — Real-ESRGAN super-resolution engine.

Reference parity: utils/enhancer.py (FaceEnhancer :21-302, tile=400/tile_pad=10
defaults :22,138-147, enhance_image :189, enhance_face_crop :237,
enhance_face_crops_batch :305, create_enhancement_summary :409,
get_available_models :454).

TPU-native redesign: the reference loops tiles serially and halves the tile on
CUDA OOM (:216-229). Here tiling is *static*: the image is reflect-padded to a
tile grid with halo padding, all halo windows are gathered into one
``[G, T+2p, T+2p, 3]`` batch, the RRDB net runs over the batch in a single XLA
dispatch, and the output is assembled by reshape. Static shapes mean OOM-retry
is replaced by a deterministic memory plan; small face crops are padded into
size buckets to bound recompilation.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.models.rrdbnet import MODEL_CATALOG, RRDBConfig, RRDBNet

__all__ = [
    "FaceEnhancer",
    "tiled_sr",
    "enhance_face_crops_batch",
    "create_enhancement_summary",
    "get_available_models",
]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_tile_grid(
    h: int,
    w: int,
    tile: int = 400,
    tile_pad: int = 10,
    max_tiles_per_batch: int = 8,
) -> tuple[int, int, int, int]:
    """Choose a per-axis halo-tile grid (gh, gw, tile_h, tile_w) minimising
    computed pixels for an [h, w] image.

    On TPU the reason to tile is NOT CUDA OOM (the reference's constraint,
    utils/enhancer.py:216-229) but the axon compile-service's program-size
    ceiling: the proven-good dispatch is 8 x (400+2*10)^2 halo windows
    (BENCH.md round-4 SR block; batches >= 12 at that window are rejected).
    That product — max_tiles_per_batch * (tile + 2*tile_pad)^2 pixels per
    dispatch — is the budget here. The reference's fixed square grid wastes
    up to 1.8x FLOPs at serving shapes (512x768 -> grid-padded to 800x800 ->
    4 x 420^2 = 1.79x the real pixels); this planner instead picks the
    fewest/cheapest per-axis tiles whose windows fit the budget: a 512x768
    image runs as ONE window with zero halo.

    Tile dims are rounded up to multiples of 8 (sublane alignment; also keeps
    halo windows even for the x2 net's pixel-unshuffle)."""
    budget = max_tiles_per_batch * (tile + 2 * tile_pad) ** 2
    best = None
    gh_max = max(1, -(-h // 64))
    gw_max = max(1, -(-w // 64))
    for gh in range(1, gh_max + 1):
        th = h if gh == 1 else _ceil_to(-(-h // gh), 8)
        win_h = th + (2 * tile_pad if gh > 1 else 0)
        for gw in range(1, gw_max + 1):
            tw = w if gw == 1 else _ceil_to(-(-w // gw), 8)
            win_w = tw + (2 * tile_pad if gw > 1 else 0)
            g = gh * gw
            chunk = min(max_tiles_per_batch, g)
            if chunk * win_h * win_w > budget:
                continue
            n_chunks = -(-g // chunk)
            cost = n_chunks * chunk * win_h * win_w  # incl. chunk-pad tiles
            key = (cost, g, abs(win_h - win_w))
            if best is None or key < best[0]:
                best = (key, (gh, gw, th, tw))
    if best is None:  # budget smaller than any window: legacy square grid
        return -(-h // tile), -(-w // tile), tile, tile
    return best[1]


def tiled_sr(
    fn: Callable[[jax.Array], jax.Array],
    image: jax.Array,
    scale: int,
    tile: int = 400,
    tile_pad: int = 10,
    max_tiles_per_batch: int = 8,
) -> jax.Array:
    """Run SR function ``fn`` ([B,h,w,3] -> [B,h*scale,w*scale,3]) over a halo-
    padded static tile grid of ``image`` [H,W,3]; returns [H*scale, W*scale, 3].

    The grid comes from :func:`plan_tile_grid` — fewest per-axis tiles whose
    halo windows fit the proven per-dispatch pixel budget (whole-image when it
    fits, replacing the reference's fixed square grid and its up-to-1.8x
    grid-pad + halo FLOPs waste). Tiles are processed in fixed-size
    sub-batches via ``lax.map`` — one compile, one dispatch, bounded
    activation memory. Measured on the v5e: batch 8 runs at 2x the MFU of
    batch 4 (per-conv fixed costs amortise over more spatial work). This
    deterministic memory plan replaces the reference's CUDA-OOM
    halve-and-retry (utils/enhancer.py:216-229)."""
    h, w = image.shape[0], image.shape[1]
    if tile <= 0:
        return fn(image[None])[0]
    gh, gw, th, tw = plan_tile_grid(h, w, tile, tile_pad, max_tiles_per_batch)
    if gh == 1 and gw == 1 and th == h and tw == w:
        return fn(image[None])[0]
    ph_pad = tile_pad if gh > 1 else 0
    pw_pad = tile_pad if gw > 1 else 0
    ph, pw = gh * th, gw * tw
    padded = jnp.pad(
        image,
        ((ph_pad, ph - h + ph_pad), (pw_pad, pw - w + pw_pad), (0, 0)),
        mode="reflect",
    )
    win_h, win_w = th + 2 * ph_pad, tw + 2 * pw_pad
    offs = jnp.asarray(
        [(i * th, j * tw) for i in range(gh) for j in range(gw)], jnp.int32
    )
    tiles = jax.vmap(
        lambda o: jax.lax.dynamic_slice(padded, (o[0], o[1], 0), (win_h, win_w, 3))
    )(offs)
    g = tiles.shape[0]
    chunk = min(max_tiles_per_batch, g)
    n_chunks = -(-g // chunk)
    if n_chunks > 1:
        pad_g = n_chunks * chunk - g
        tiles = jnp.pad(tiles, ((0, pad_g), (0, 0), (0, 0), (0, 0)))
        out = jax.lax.map(fn, tiles.reshape(n_chunks, chunk, win_h, win_w, 3))
        out = out.reshape(n_chunks * chunk, win_h * scale, win_w * scale, 3)[:g]
    else:
        out = fn(tiles)  # [G, win_h*s, win_w*s, 3]
    py, px = ph_pad * scale, pw_pad * scale
    core = out[:, py : py + th * scale, px : px + tw * scale, :]
    core = core.reshape(gh, gw, th * scale, tw * scale, 3)
    full = core.transpose(0, 2, 1, 3, 4).reshape(ph * scale, pw * scale, 3)
    return full[: h * scale, : w * scale]


_SIZE_BUCKETS = (32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048)

# Committed golden-trained weights (tools/sr_golden_train.py) picked up by
# catalog name when no explicit model_path is given — the analog of the
# reference's pretrained-weight auto-download (utils/enhancer.py:99-156;
# upstream's shipped x4 weights are GAN-trained, hence the gan arm here).
_GOLDEN_CKPTS = {
    "RealESRGAN_x4plus": "rrdb_x4gan_golden.npz",
    "RealESRGAN_x2plus": "rrdb_x2_golden.npz",
    "RealESRGAN_x4cascade": "rrdb_x2_golden.npz",
}

# Names that run the x2 net TWICE for a 4x output instead of a single-pass
# x4 net. Real-ESRGANer itself decouples model scale from outscale
# (reference utils/enhancer.py:189 netscale vs outscale, resolved by resize);
# the cascade resolves it by a second restoration pass instead — measured
# as the only x4 arm whose crops beat the originals on the IQA table
# (eval/assets/sr_x4cascade_report.json).
_CASCADE_ALIASES = {"RealESRGAN_x4cascade": "RealESRGAN_x2plus"}


def _golden_ckpt_path(model_name: str) -> Optional[str]:
    fname = _GOLDEN_CKPTS.get(model_name)
    if fname is None:
        return None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "eval", "assets", fname,
    )
    return path if os.path.exists(path) else None


def _bucket_dim(x: int) -> int:
    for b in _SIZE_BUCKETS:
        if x <= b:
            return b
    return _ceil_to(x, 512)


class FaceEnhancer:
    """Real-ESRGAN enhancer (reference utils/enhancer.py:21).

    model_name ∈ MODEL_CATALOG; ``half=True`` selects bfloat16 compute (the TPU
    analog of the reference's fp16, :88-91). ``model_path`` loads a converted
    ``.npz`` checkpoint; None resolves the committed golden-trained weights
    for catalog names (random init when absent or when ``cfg`` is custom).
    """

    def __init__(
        self,
        model_name: str = "RealESRGAN_x4plus",
        model_path: Optional[str] = None,
        outscale: float = 4.0,
        tile: int = 400,
        tile_pad: int = 10,
        half: bool = True,
        device: Optional[str] = None,
        cfg: Optional[RRDBConfig] = None,
        max_tiles_per_batch: int = 8,
        cascade: bool = False,
    ):
        if model_name in _CASCADE_ALIASES:
            cascade = True
        if cfg is None:
            catalog_name = _CASCADE_ALIASES.get(model_name, model_name)
            if catalog_name not in MODEL_CATALOG:
                raise ValueError(
                    f"unknown model {model_name!r}; available: "
                    f"{list(MODEL_CATALOG) + list(_CASCADE_ALIASES)}"
                )
            cfg = MODEL_CATALOG[catalog_name]
            if model_path is None:
                model_path = _golden_ckpt_path(model_name)
                if model_path:
                    print(f"[enhancer] golden-trained weights: "
                          f"{os.path.basename(model_path)}")
        on_cpu = (device or jax.devices()[0].platform) in ("cpu", "CPU")
        if on_cpu:
            # CPU mode: full precision + small tiles, mirroring the
            # reference's CPU fallbacks (utils/enhancer.py:88-91)
            half = False
            if tile > 200:
                tile = 200
        if half:
            cfg = dataclasses.replace(cfg, dtype="bfloat16")
        self.cfg = cfg
        self.model_name = model_name
        self.cascade = bool(cascade)
        self.outscale = float(outscale)
        self.tile = tile
        self.tile_pad = tile_pad
        self.max_tiles_per_batch = max_tiles_per_batch
        self.device = device
        self.model = RRDBNet(cfg)
        if model_path is None:
            m = max(cfg.scale, 2)
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 2 * m, 2 * m, cfg.num_in_ch))
            )
        else:
            from facedet_tpu.engine.detector import load_params_npz

            self.variables = load_params_npz(model_path)
        self.stats = {"images": 0, "seconds": 0.0}

    @functools.cached_property
    def _forward(self):
        @jax.jit
        def fwd(variables, x):
            return jnp.clip(self.model.apply(variables, x), 0.0, 1.0)

        return fwd

    def _net(self, x: jax.Array) -> jax.Array:
        return self._forward(self.variables, x)

    def _enhance_pipeline(self, h: int, w: int, outscale: float):
        """ONE jitted function for the whole tiled SR of an (h, w) image —
        eager per-stage dispatch costs seconds over a remote TPU link."""
        cache = self.__dict__.setdefault("_enh_cache", {})
        key = (h, w, outscale, self.tile, self.tile_pad, self.cascade)
        if key in cache:
            return cache[key]
        s = self.cfg.scale
        m = 2 if s == 2 else (4 if s == 1 else 1)
        # cascade arm: reach outscale >= s^2 with a second restoration pass
        # instead of a lanczos resize (only x4 arm that improves crop IQA —
        # eval/assets/sr_x4cascade_report.json)
        n_passes = 2 if (self.cascade and s > 1 and outscale >= s * s - 1e-6) else 1
        s_eff = s ** n_passes

        @jax.jit
        def pipeline(variables, image):
            def net(x):
                return jnp.clip(self.model.apply(variables, x), 0.0, 1.0)

            img = image
            if h % m or w % m:  # pixel-unshuffle divisibility
                img = jnp.pad(img, ((0, (-h) % m), (0, (-w) % m), (0, 0)), mode="reflect")
            out = tiled_sr(net, img, s, self.tile, self.tile_pad,
                           self.max_tiles_per_batch)
            out = out[: h * s, : w * s]
            if n_passes == 2:
                out = tiled_sr(net, out, s, self.tile, self.tile_pad,
                               self.max_tiles_per_batch)
                out = out[: h * s_eff, : w * s_eff]
            if abs(outscale - s_eff) > 1e-6:
                th, tw = int(round(h * outscale)), int(round(w * outscale))
                out = jax.image.resize(out, (th, tw, 3), method="lanczos3")
                out = jnp.clip(out, 0.0, 1.0)
            return out

        cache[key] = pipeline
        return pipeline

    def enhance_array(self, image: jax.Array, outscale: Optional[float] = None) -> jax.Array:
        """Device path: [H,W,3] float in [0,1] -> enhanced float array
        (single fused dispatch per image shape)."""
        outscale = self.outscale if outscale is None else float(outscale)
        h, w = int(image.shape[0]), int(image.shape[1])
        pipeline = self._enhance_pipeline(h, w, outscale)
        return pipeline(self.variables, image)

    def enhance_image(
        self, image: np.ndarray, outscale: Optional[float] = None
    ) -> tuple[np.ndarray, float]:
        """Host path (reference utils/enhancer.py:189): uint8 HWC in ->
        (uint8 HWC out, elapsed seconds)."""
        t0 = time.perf_counter()
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.shape[-1] == 4:
            img = img[..., :3]
        x = jnp.asarray(img, jnp.float32) / 255.0
        out = self.enhance_array(x, outscale)
        # quantise ON DEVICE: the x4 output is 16x the input pixels, so
        # downloading f32 would move 4x more bytes than the uint8 result
        out8 = np.asarray(jnp.round(out * 255.0).astype(jnp.uint8))
        dt = time.perf_counter() - t0
        self.stats["images"] += 1
        self.stats["seconds"] += dt
        return out8, dt

    def enhance_detections(
        self,
        image: jax.Array,
        detections,
        crop_size: int = 128,
        margin: float = 0.1,
    ) -> jax.Array:
        """Fused detect->crop->enhance: extract every detection's box from the
        image on device (ops/crop_resize.py), batch them at a static
        ``crop_size``, and run the SR net over the whole batch in one dispatch
        — replacing the reference's per-crop file round-trip
        (pipeline_v1_detection_first/app_v1.py:88-106, utils/enhancer.py:344-391).

        Returns [N, crop_size*scale, crop_size*scale, 3] enhanced crops (rows
        for invalid detections are garbage — mask with ``detections.valid``).
        """
        from facedet_tpu.ops.crop_resize import crop_and_resize

        crops = crop_and_resize(image, detections.boxes, crop_size, margin)
        out = self._net(crops)
        if self.cascade:  # cascade arm: crops at scale^2 via a second pass
            out = self._net(out)
        return out

    def _load_bucketed(self, input_path: str):
        """File -> (device float image reflect-padded to the size bucket,
        true (h, w)) — the shared preamble of both fetch paths, so bucketing
        and padding policy cannot diverge between them."""
        from facedet_tpu.utils.viz import load_image

        img = load_image(input_path)
        h, w = img.shape[:2]
        bh, bw = _bucket_dim(h), _bucket_dim(w)
        x = jnp.asarray(img, jnp.float32) / 255.0
        if (bh, bw) != (h, w):
            x = jnp.pad(x, ((0, bh - h), (0, bw - w), (0, 0)), mode="reflect")
        return x, h, w

    def enhance_face_crop(
        self,
        input_path: str,
        output_path: str,
        outscale: Optional[float] = None,
        jpeg_quality: int = 95,
    ) -> bool:
        """File -> file crop enhancement (reference utils/enhancer.py:237), with
        size-bucket padding so varied crop sizes share compilations."""
        from facedet_tpu.utils.viz import save_image

        x, h, w = self._load_bucketed(input_path)
        out = self.enhance_array(x, outscale)
        sc = (self.outscale if outscale is None else outscale)
        out = out[: int(round(h * sc)), : int(round(w * sc))]
        save_image(output_path, np.asarray(jnp.round(out * 255.0).astype(jnp.uint8)), quality=jpeg_quality)
        return True

    def _enhance_dct_pipeline(
        self, h: int, w: int, outscale: float, quality: int, sparse: bool = False
    ):
        """SR + device-side JPEG-domain encode in ONE jitted dispatch: the
        x4 output (16x the input pixels — the fetch, not the upload, is the
        bandwidth problem here) comes back as quantized DCT coefficient
        planes in wire layout (ops/jpeg_dct.py::encode_dct420_device) instead
        of raw RGB: ~2x fewer nominal bytes, and the near-all-zero
        coefficient-major int8 planes compress ~1.9x better through the link
        (BENCH.md wire-layout study). The host entropy-codes them straight
        into a .jpg (native jpeg_write_coefficients) — no DCT and no pixel
        materialization anywhere on the host.

        ``sparse=True`` additionally packs the AC planes on device into a
        presence bitmap + value array capped at 25% density
        (ops/jpeg_dct.py::pack_sparse_bitmap_device) — the fetch mirror of the
        dct420s ingest wire, ~2.7x fewer nominal download bytes; the
        returned nnz tells the caller whether the cap held."""
        from facedet_tpu.ops.jpeg_dct import encode_dct420_device, quality_tables

        cache = self.__dict__.setdefault("_enh_dct_cache", {})
        key = (h, w, outscale, quality, self.tile, self.tile_pad, sparse)
        if key in cache:
            return cache[key]
        qy, qc = quality_tables(quality)
        sr = self._enhance_pipeline(h, w, outscale)
        th = int(round(h * outscale))
        tw = int(round(w * outscale))
        ph, pw = -(-th // 16) * 16, -(-tw // 16) * 16

        # sparse-fetch value capacity: 25% density, far above typical SR
        # output AC density at q90-95; nnz overflow falls back to dense
        total_ac = 64 * (ph // 8) * (pw // 8) + 2 * 64 * (ph // 16) * (pw // 16)
        cap = ((total_ac // 4) + 7) & ~7

        @jax.jit
        def pipeline(variables, image):
            out = sr(variables, image)
            out = jnp.pad(
                out, ((0, ph - th), (0, pw - tw), (0, 0)), mode="edge"
            )
            # wide (int16) AC wire: sharpened SR output routinely exceeds
            # the int8 range in a few hundred blocks, which silently forced
            # every serving image through the pixel-fetch fallback
            # (probe_sr_e2e; BENCH.md round-5 SR serving study)
            planes = encode_dct420_device(
                out, jnp.asarray(qy), jnp.asarray(qc), wide_ac=True
            )
            if not sparse:
                return planes
            from facedet_tpu.ops.jpeg_dct import pack_sparse_bitmap_device

            y_dc, y_ac, uv_dc, uv_ac, n_clipped = planes
            flat = jnp.concatenate([y_ac.reshape(-1), uv_ac.reshape(-1)])
            bitmap, vals, nnz = pack_sparse_bitmap_device(flat, cap)
            return y_dc, uv_dc, bitmap, vals, nnz, n_clipped

        entry = (pipeline, qy, qc, (th, tw))
        cache[key] = entry
        return entry

    def enhance_to_jpeg(
        self,
        input_path: str,
        output_path: str,
        outscale: Optional[float] = None,
        quality: int = 95,
        sparse: bool = False,
    ) -> bool:
        """File -> enhanced .jpg with the output fetched as quantized DCT
        coefficients and entropy-coded natively (see _enhance_dct_pipeline).
        Same size-bucketing and default JPEG quality as
        :meth:`enhance_face_crop`, so ``--fetch`` is a pure transport choice.
        Extreme-contrast outputs whose quantized AC exceeds the int8 wire
        range (the read path's -6 condition) fall back to the pixel fetch
        rather than shipping clipped coefficients; likewise when the native
        writer is unavailable. ``sparse=True`` downloads the AC planes as a
        bitmap + packed values (the dct420s wire, ~2.7x fewer nominal
        bytes); density above the 25% cap falls back to the dense fetch."""
        from facedet_tpu.data.native_loader import save_dct420_jpeg
        from facedet_tpu.ops.jpeg_dct import wire_planes_to_dct_image

        x, h, w = self._load_bucketed(input_path)
        bh, bw = int(x.shape[0]), int(x.shape[1])
        sc = self.outscale if outscale is None else float(outscale)
        pipeline, qy, qc, _bucket_thw = self._enhance_dct_pipeline(
            bh, bw, sc, quality, sparse=sparse
        )
        th, tw = int(round(h * sc)), int(round(w * sc))
        if sparse:
            from facedet_tpu.ops.jpeg_dct import unpack_sparse_bitmap_np

            y_dc, uv_dc, bitmap, vals, nnz, n_clipped = pipeline(
                self.variables, x
            )
            if int(n_clipped) > 0:
                return self.enhance_face_crop(
                    input_path, output_path, outscale, jpeg_quality=quality
                )
            if int(nnz) > vals.shape[0]:  # density above the cap: dense fetch
                return self.enhance_to_jpeg(
                    input_path, output_path, outscale, quality, sparse=False
                )
            yb_h, yb_w = y_dc.shape
            cb_h, cb_w = uv_dc.shape[:2]
            ny = 64 * yb_h * yb_w
            flat = unpack_sparse_bitmap_np(
                np.asarray(bitmap), np.asarray(vals), ny + 2 * 64 * cb_h * cb_w
            )
            planes = (
                np.asarray(y_dc),
                flat[:ny].reshape(64, yb_h, yb_w),
                np.asarray(uv_dc),
                flat[ny:].reshape(2, 64, cb_h, cb_w),
            )
        else:
            *planes, n_clipped = pipeline(self.variables, x)
            if int(n_clipped) > 0:
                return self.enhance_face_crop(
                    input_path, output_path, outscale, jpeg_quality=quality
                )
        d = wire_planes_to_dct_image(planes, qy, qc, (th, tw))
        if save_dct420_jpeg(output_path, d):
            return True
        # no native lib: decode the fetched planes on host and save pixels
        from facedet_tpu.engine.predict import _display_image
        from facedet_tpu.utils.viz import save_image

        save_image(output_path, _display_image(d), quality=quality)
        return True

    def get_model_info(self) -> dict:
        """Reference utils/enhancer.py:291."""
        n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(self.variables))
        return {
            "model_name": self.model_name,
            "scale": self.cfg.scale ** (2 if self.cascade else 1),
            "net_scale": self.cfg.scale,
            "cascade": self.cascade,
            "outscale": self.outscale,
            "num_block": self.cfg.num_block,
            "num_feat": self.cfg.num_feat,
            "tile": self.tile,
            "tile_pad": self.tile_pad,
            "dtype": self.cfg.dtype,
            "num_params": n_params,
        }


def get_available_models() -> dict[str, dict]:
    """Reference utils/enhancer.py:454."""
    out = {
        name: {"scale": cfg.scale, "num_block": cfg.num_block}
        for name, cfg in MODEL_CATALOG.items()
    }
    for alias, base in _CASCADE_ALIASES.items():
        cfg = MODEL_CATALOG[base]
        out[alias] = {
            "scale": cfg.scale * cfg.scale,
            "num_block": cfg.num_block,
            "cascade": True,
        }
    return out


def enhance_face_crops_batch(
    input_dir: str,
    output_dir: str,
    enhancer: FaceEnhancer,
    outscale: Optional[float] = None,
    max_retries: int = 2,
    fetch: str = "rgb",
) -> dict:
    """Iterate a crops directory, enhance each crop file with per-file retry,
    return a stats dict (reference utils/enhancer.py:305-407).

    ``fetch="dct420"`` downloads each result as device-encoded DCT
    coefficients and entropy-codes them natively into the output .jpg
    (enhance_to_jpeg) — the low-bandwidth fetch mirror of the dct420
    ingest; non-.jpg outputs keep the pixel path."""
    os.makedirs(output_dir, exist_ok=True)
    files = sorted(
        f
        for f in os.listdir(input_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
    )
    stats = {
        "total": len(files),
        "enhanced": 0,
        "failed": 0,
        "failed_files": [],
        "seconds": 0.0,
    }
    t0 = time.perf_counter()
    for fname in files:
        src = os.path.join(input_dir, fname)
        dst = os.path.join(output_dir, fname)
        ok = False
        use_dct = fetch in ("dct420", "dct420s") and dst.lower().endswith(
            (".jpg", ".jpeg")
        )
        for _ in range(max_retries):
            try:
                if use_dct:
                    enhancer.enhance_to_jpeg(
                        src, dst, outscale, sparse=fetch == "dct420s"
                    )
                else:
                    enhancer.enhance_face_crop(src, dst, outscale)
                ok = True
                break
            except Exception:  # per-file resilience (reference :362-377)
                continue
        if ok:
            stats["enhanced"] += 1
        else:
            stats["failed"] += 1
            stats["failed_files"].append(fname)
    stats["seconds"] = time.perf_counter() - t0
    return stats


def create_enhancement_summary(
    stats: dict, output_path: Optional[str] = None, model_info: Optional[dict] = None
) -> str:
    """Text report (reference utils/enhancer.py:409-451)."""
    lines = [
        "ENHANCEMENT SUMMARY",
        "=" * 40,
        f"Total crops: {stats.get('total', 0)}",
        f"Enhanced: {stats.get('enhanced', 0)}",
        f"Failed: {stats.get('failed', 0)}",
        f"Elapsed: {stats.get('seconds', 0.0):.2f}s",
    ]
    if stats.get("failed_files"):
        lines.append("Failed files: " + ", ".join(stats["failed_files"]))
    if model_info:
        lines.append("")
        lines.append("Model:")
        for k, v in model_info.items():
            lines.append(f"  {k}: {v}")
    report = "\n".join(lines)
    if output_path:
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        with open(output_path, "w") as f:
            f.write(report)
    return report
