"""Pallas TPU kernels for ops XLA lowers poorly.

histogram256: the frontend equalizes each plane image per frame
(reference cv::equalizeHist, src/GraphicEnd.cpp:418); a 256-bin
histogram in plain XLA either scatter-adds (serialized on TPU) or
materializes a (256, N) compare matrix in HBM (~75 MB per image). The
Pallas kernel streams (16,128) pixel tiles through VMEM and accumulates
all 256 bins per tile with one vectorized compare-reduce — no HBM
intermediates, sequential-grid accumulation into a (2,128) output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_ROWS = 16
LANES = 128
TILE_PX = TILE_ROWS * LANES


def _hist_kernel(img_ref, out_ref):
    """Per-LANE partial histograms: each pixel row (1,128) is compared
    against a (256,128) bin grid — fully lane-aligned 2D VPU work (a 3D
    bins-by-pixels broadcast crashes the mosaic backend; and per-lane
    counters need no cross-lane ops inside the kernel). The host sums
    over lanes afterwards."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    bins2d = jax.lax.broadcasted_iota(
        jnp.int32, (256, LANES), 0).astype(jnp.float32)

    def body(r, acc):
        row = img_ref[r, :]
        return acc + (row[None, :] == bins2d).astype(jnp.float32)

    acc = jax.lax.fori_loop(
        0, TILE_ROWS, body, jnp.zeros((256, LANES), jnp.float32))

    @pl.when(i == 0)
    def _():
        out_ref[:] = acc

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _histogram256_pallas(values_f32):
    """values_f32: flat (N,) float32 integers in [0,255]. -> (256,) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = values_f32.shape[0]
    n_pad = ((n + TILE_PX - 1) // TILE_PX) * TILE_PX
    x = jnp.full((n_pad,), -1.0, jnp.float32).at[:n].set(values_f32)
    x = x.reshape(n_pad // LANES, LANES)
    n_tiles = n_pad // TILE_PX

    out = pl.pallas_call(
        _hist_kernel,
        out_shape=jax.ShapeDtypeStruct((256, LANES), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(x)
    return jnp.sum(out, axis=1)


def _histogram256_xla(values_f32):
    """Fallback: fused compare-reduce (fine on CPU, HBM-heavy on TPU)."""
    bins = jnp.arange(256, dtype=jnp.float32)
    return jnp.sum(
        (values_f32[None, :] == bins[:, None]).astype(jnp.float32), axis=1
    )


def histogram256(values, use_pallas: bool | None = None):
    """256-bin histogram of integer-valued data (any shape). -> (256,) f32."""
    flat = values.reshape(-1).astype(jnp.float32)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _histogram256_pallas(flat)
    return _histogram256_xla(flat)


# ---------------------------------------------------------------------------
# LUT application without gathers
# ---------------------------------------------------------------------------

LUT_ROWS = 64


def _lut_kernel(lut_d_ref, img_ref, out_ref):
    """out = lut[img] by telescoping: lut[v] == sum_b (v >= b) * d[b]
    with d[b] = lut[b] - lut[b-1]. A 256-entry gather per pixel is an
    element-at-a-time loop on TPU; this form is 256 lane-aligned
    compare+FMA sweeps over the tile instead."""
    tile = img_ref[:]

    def body(b, acc):
        d = lut_d_ref[0, b]
        return acc + d * (tile >= b.astype(jnp.float32)).astype(jnp.float32)

    out_ref[:] = jax.lax.fori_loop(
        0, 256, body, jnp.zeros_like(tile))


def _apply_lut256_pallas(values_f32, lut):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = values_f32.shape[0]
    blk = LUT_ROWS * LANES
    n_pad = ((n + blk - 1) // blk) * blk
    x = jnp.full((n_pad,), -1.0, jnp.float32).at[:n].set(values_f32)
    x = x.reshape(n_pad // LANES, LANES)
    d = jnp.concatenate([lut[:1], lut[1:] - lut[:-1]]).astype(jnp.float32)

    out = pl.pallas_call(
        _lut_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LUT_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LUT_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(d.reshape(1, 256), x)
    return out.reshape(-1)[:n]


def _min_eig_kernel(img_ref, out_ref, *, real_w: int, stripe: int):
    """Fused Shi-Tomasi response: Sobel -> 3x3 box -> min eigenvalue.

    Streams row stripes through VMEM registers — a whole-image version
    keeps ~20 full-size intermediates live and overflows the 16 MB
    scoped VMEM. img_ref is the edge-padded image (H+2, Wp+2); out
    (H, Wp). Columns >= real_w are lane padding.
    """
    Hp, Wp = img_ref.shape
    H, W = Hp - 2, Wp - 2

    def sl(a, dy, dx, h, w):
        return jax.lax.slice(a, (dy, dx), (dy + h, dx + w))

    def grad_rows(r0, n):
        """Sobel gradient for output rows r0..r0+n (clamped to image)."""
        lo = max(r0, 0)
        hi = min(r0 + n, H)
        x = img_ref[lo:hi + 2, :]  # padded rows covering the window
        m = hi - lo
        gdx = (sl(x, 0, 2, m, W) - sl(x, 0, 0, m, W)
               + 2.0 * (sl(x, 1, 2, m, W) - sl(x, 1, 0, m, W))
               + sl(x, 2, 2, m, W) - sl(x, 2, 0, m, W))
        gdy = (sl(x, 2, 0, m, W) - sl(x, 0, 0, m, W)
               + 2.0 * (sl(x, 2, 1, m, W) - sl(x, 0, 1, m, W))
               + sl(x, 2, 2, m, W) - sl(x, 0, 2, m, W))
        # edge-replicate rows clipped at the image border (box_filter's
        # gradient-padding semantics); explicit concatenates — mosaic
        # rejects the zero-size broadcasts jnp.pad(mode="edge") emits
        top = lo - r0
        bot = (r0 + n) - hi

        def vpad(a):
            parts = []
            if top > 0:
                parts.append(jnp.broadcast_to(a[0:1], (top, W)))
            parts.append(a)
            if bot > 0:
                parts.append(jnp.broadcast_to(a[-1:], (bot, W)))
            return jnp.concatenate(parts, axis=0) if len(parts) > 1 else a

        gdx = vpad(gdx)
        gdy = vpad(gdy)
        # lane padding: clamp to the true last column
        col = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)
        gdx = jnp.where(col < real_w, gdx,
                        jax.lax.slice(gdx, (0, real_w - 1), (n, real_w)))
        gdy = jnp.where(col < real_w, gdy,
                        jax.lax.slice(gdy, (0, real_w - 1), (n, real_w)))
        return gdx, gdy

    for r0 in range(0, H, stripe):
        n = min(stripe, H - r0)
        gdx, gdy = grad_rows(r0 - 1, n + 2)  # +-1 halo for the box

        def box(a):
            ap = jnp.concatenate(
                [a[:, 0:1], a, a[:, -1:]], axis=1)  # horizontal edge pad
            s = jnp.zeros((n, W), a.dtype)
            for oy in range(3):
                for ox in range(3):
                    s = s + sl(ap, oy, ox, n, W)
            return s / 9.0

        sxx = box(gdx * gdx)
        syy = box(gdy * gdy)
        sxy = box(gdx * gdy)
        tr_half = (sxx + syy) * 0.5
        det_part = jnp.sqrt(((sxx - syy) * 0.5) ** 2 + sxy * sxy)
        out_ref[r0:r0 + n, :] = tr_half - det_part


def min_eig_response_fused(img, use_pallas: bool | None = None):
    """Shi-Tomasi min-eigenvalue response map (H,W) -> (H,W).

    Numerically matches ops/features/harris.min_eig_response (same
    Sobel + box pipeline, edge padding) but runs as one Pallas block.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        from ..ops.features import harris  # local import: avoid cycle

        return harris.min_eig_response(img)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    Wp = ((W + LANES - 1) // LANES) * LANES
    x = img.astype(jnp.float32)
    if Wp > W:
        x = jnp.pad(x, ((0, 0), (0, Wp - W)), mode="edge")
    x = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")

    out = pl.pallas_call(
        functools.partial(_min_eig_kernel, real_w=W, stripe=64),
        out_shape=jax.ShapeDtypeStruct((H, Wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return out[:, :W]


def apply_lut256(values, lut, use_pallas: bool | None = None):
    """Elementwise lut[values] for integer-valued `values` in [0,255].

    lut: (256,) numeric. Returns float32, same shape as values.
    """
    shape = values.shape
    flat = values.reshape(-1).astype(jnp.float32)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        out = _apply_lut256_pallas(flat, lut.astype(jnp.float32))
    else:
        out = lut.astype(jnp.float32)[flat.astype(jnp.int32)]
    return out.reshape(shape)
