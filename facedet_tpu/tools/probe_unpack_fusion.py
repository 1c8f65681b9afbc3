"""Probe the unpack->IDCT layout fusion (VERDICT r4 directive 4).

The stage profile pins ~1.05 ms/img in unpack (0.53) + idct (0.52). The
sparse-AC wire is COEFFICIENT-major (same-coefficient values cluster for the
link compressor), so the scatter materialises [64, Hb, Wb] planes and the
decode pays a moveaxis into the IDCT matmul's block-major [Hb, Wb, 64]
layout. If the wire's canonical flat order were block-major instead, the
scatter would land directly in matmul layout and the relayout would vanish —
at the cost of whatever link-compression ratio coefficient-major clustering
buys.

Variants (device, K-difference, batch of serving-shaped planes):
  current      scatter(coef-major) -> moveaxis/transpose -> dequant matmul
  blockmajor   scatter(block-major flat order) -> reshape (free) -> matmul
  permscatter  coef-major wire, positions permuted to block-major at scatter
               time (unsorted indices — measures whether XLA still lowers a
               vector scatter without the sorted/unique hints)

Wire side (host, live-upload timing a la bench._link_probe): pack the SAME
natural image's AC in both flat orders and time device_put of each wire —
the tunnel compressor is the real arbiter of the ordering tradeoff.

Run: python -m facedet_tpu.tools.probe_unpack_fusion
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.ops.jpeg_dct import _IDCT64, encode_dct420, quality_tables
from facedet_tpu.utils.cache import enable_compilation_cache


def kdiff(fn, args, k=9, rounds=5):
    @jax.jit
    def rep(n, *a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(rep(n, *args))
        return time.perf_counter() - t0

    timed(1)
    diffs = sorted(
        d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds))
        if d > 0
    )
    return diffs[len(diffs) // 2] * 1e3 if diffs else float("nan")


def _natural_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 210, (h // 32, w // 32, 3))
    img = np.kron(base, np.ones((32, 32, 1)))
    img = img + rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def pack_order(flat: np.ndarray, cap: int):
    """Host pack of a flat int8 array: (deltas uint16, vals int8)."""
    nz = np.flatnonzero(flat)
    nz = nz[:cap]
    deltas = np.zeros(cap, np.uint16)
    vals = np.zeros(cap, np.int8)
    prev = -1
    d = np.diff(np.concatenate([[-1], nz])).astype(np.uint16)
    deltas[: len(nz)] = d
    vals[: len(nz)] = flat[nz]
    return deltas, vals, len(nz)


def main(h: int = 1024, w: int = 1536, batch: int = 8):
    enable_compilation_cache()
    img = _natural_image(h, w)
    d = encode_dct420(img, quality=90)
    # in-memory planes are block-major: y_ac [hb, wb, 64], uv_ac
    # [cbh, cbw, 2, 64]; the WIRE flattens them coefficient-major
    # ([64, hb, wb] — engine/predict.py's unpack reshapes confirm)
    hb, wb = d.y_ac.shape[0], d.y_ac.shape[1]
    cbh, cbw = d.uv_ac.shape[0], d.uv_ac.shape[1]
    ny = 64 * hb * wb
    nc = 2 * 64 * cbh * cbw
    n = ny + nc
    print(f"planes: y_ac {d.y_ac.shape}, uv_ac {d.uv_ac.shape}, n={n}")

    flat_coef = np.concatenate([
        np.moveaxis(d.y_ac, -1, 0).reshape(-1),           # [64, hb, wb]
        np.transpose(d.uv_ac, (2, 3, 0, 1)).reshape(-1),  # [2, 64, cbh, cbw]
    ])
    flat_block = np.concatenate([
        d.y_ac.reshape(-1),                                # [hb, wb, 64]
        d.uv_ac.reshape(-1),                               # [cbh, cbw, 2, 64]
    ])
    nnz = int(np.count_nonzero(flat_coef))
    cap = ((n // 4) + 7) & ~7
    print(f"nnz {nnz} ({100 * nnz / n:.1f}%), cap {cap}")

    dc_y = jnp.asarray(np.stack([d.y_dc] * batch))
    qy, _qc = quality_tables(90)
    q = jax.device_put(jnp.asarray(qy))
    basis = jax.device_put(jnp.asarray(_IDCT64))

    dd_c, vv_c, _ = pack_order(flat_coef, cap)
    dd_b, vv_b, _ = pack_order(flat_block, cap)
    deltas_c = jax.device_put(jnp.asarray(np.stack([dd_c] * batch)))
    vals_c = jax.device_put(jnp.asarray(np.stack([vv_c] * batch)))
    deltas_b = jax.device_put(jnp.asarray(np.stack([dd_b] * batch)))
    vals_b = jax.device_put(jnp.asarray(np.stack([vv_b] * batch)))
    jax.block_until_ready((deltas_c, vals_c, deltas_b, vals_b, dc_y))

    def scatter(deltas, vals, sorted_hint=True, pos_map=None):
        pos = jnp.cumsum(deltas.astype(jnp.int32), axis=-1) - 1
        pos = jnp.minimum(pos, n)
        if pos_map is not None:
            pos = jnp.where(pos < n, pos_map(pos), n)
            sorted_hint = False
        def one(p, v):
            return (
                jnp.zeros(n + 1, jnp.int8)
                .at[p]
                .set(v, mode="drop", indices_are_sorted=sorted_hint,
                     unique_indices=True)[:n]
            )
        return jax.vmap(one)(pos, vals)

    def idct_y_from_blockmajor(y_ac_bm, dc, i):
        # y_ac_bm [B, hb, wb, 64] already in matmul layout
        coef = y_ac_bm.astype(jnp.float32)
        coef = coef.at[..., 0].set(dc.astype(jnp.float32) + (i % 3))
        blocks = coef.reshape(batch, hb * wb, 64) @ (q[:, None] * basis)
        return jnp.sum(blocks.astype(jnp.bfloat16).astype(jnp.float32))

    def current(i, deltas, vals, dc):
        flat = scatter(deltas, vals)
        y_bm = jnp.moveaxis(flat[:, :ny].reshape(batch, 64, hb, wb), 1, -1)
        return idct_y_from_blockmajor(y_bm, dc, i)

    def blockmajor(i, deltas, vals, dc):
        flat = scatter(deltas, vals)
        y_bm = flat[:, :ny].reshape(batch, hb, wb, 64)
        return idct_y_from_blockmajor(y_bm, dc, i)

    def permscatter(i, deltas, vals, dc):
        def pmap(pos):
            in_y = pos < ny
            k = pos // (hb * wb)
            b = pos % (hb * wb)
            return jnp.where(in_y, b * 64 + k, pos)
        flat = scatter(deltas, vals, pos_map=pmap)
        y_bm = flat[:, :ny].reshape(batch, hb, wb, 64)
        return idct_y_from_blockmajor(y_bm, dc, i)

    for name, fn, args in [
        ("current", current, (deltas_c, vals_c, dc_y)),
        ("blockmajor", blockmajor, (deltas_b, vals_b, dc_y)),
        ("permscatter", permscatter, (deltas_c, vals_c, dc_y)),
    ]:
        t = kdiff(lambda i, dd, vv, dc, _f=fn: _f(i, dd, vv, dc), args)
        print(f"{name:12s} {t / batch:7.3f} ms/img (batch {batch})", flush=True)

    # numeric parity of the two wire orders
    a = jax.jit(lambda d_, v_: scatter(d_, v_))(deltas_c, vals_c)
    y_cur = np.moveaxis(np.asarray(a)[:, :ny].reshape(batch, 64, hb, wb), 1, -1)
    b = jax.jit(lambda d_, v_: scatter(d_, v_))(deltas_b, vals_b)
    y_bm = np.asarray(b)[:, :ny].reshape(batch, hb, wb, 64)
    print("wire-order parity:", bool((y_cur == y_bm).all()))

    # live-upload compressibility A/B: time device_put of each wire layout
    def timed_upload(arr, rounds=5):
        ts = []
        for r in range(rounds):
            x = np.array(arr)  # fresh buffer each round (defeat caching)
            x[0] ^= r + 1
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(x))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    wire_c = np.concatenate([dd_c.view(np.int8), vv_c])
    wire_b = np.concatenate([dd_b.view(np.int8), vv_b])
    big_c = np.tile(wire_c, 64)
    big_b = np.tile(wire_b, 64)
    tc = timed_upload(big_c)
    tb = timed_upload(big_b)
    print(f"upload {big_c.nbytes / 1e6:.1f} MB: coef-major {tc * 1e3:.0f} ms, "
          f"block-major {tb * 1e3:.0f} ms ({tb / tc:.2f}x)")
    import zlib
    zc = len(zlib.compress(wire_c.tobytes(), 6))
    zb = len(zlib.compress(wire_b.tobytes(), 6))
    print(f"zlib proxy: coef-major {zc}, block-major {zb} ({zb / zc:.2f}x)")


if __name__ == "__main__":
    main()
