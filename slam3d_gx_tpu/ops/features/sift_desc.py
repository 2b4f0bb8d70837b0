"""SIFT descriptor + orientation assignment on arbitrary keypoints.

Parity target: cv::SIFT descriptors (the reference's default descriptor,
parameters.yaml:9), including the OpenCV conventions that shape FLANN
distances downstream: 4x4 spatial bins x 8 orientations, Gaussian window,
0.2 clipping, renormalize, scale by 512 and saturate to [0,255].

TPU re-architecture: instead of per-pixel scatter loops, each keypoint is
described from a fixed 16x16 rotated sample grid (16 samples per spatial
bin). Sample positions in bin coordinates are static, so the sample ->
spatial-bin trilinear weights are a constant (256,16) matrix; only the
orientation-bin interpolation is data-dependent. The whole descriptor
becomes gather (bilinear taps) + one (16,256)x(256,8) matmul per keypoint,
vmapped over K keypoints — MXU-batched, no scalar loops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .common import Keypoints, gaussian_blur, sobel_gradients

_HI = jax.lax.Precision.HIGHEST

D = 4        # spatial bins per axis
NBINS = 8    # orientation bins
SAMPLES = 16  # samples per axis (4 per bin)
SCL_FCTR = 3.0  # bin width = SCL_FCTR * scl (OpenCV SIFT_DESCR_SCL_FCTR)
ORI_BINS = 36
ORI_SIG_FCTR = 1.5
ORI_RADIUS_BINS = 3.0  # radius = 3 * 1.5 * scl


def _sample_offsets_bins():
    """Static (256,2) sample positions in bin units, covering [-2,2)^2."""
    step = D / SAMPLES  # 0.25 bins
    coords = (np.arange(SAMPLES) + 0.5) * step - D / 2  # -1.875 .. 1.875
    gy, gx = np.meshgrid(coords, coords, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (256,2)


def _spatial_weights():
    """Static (256, D*D) trilinear spatial weights for the fixed grid."""
    offs = _sample_offsets_bins() + D / 2 - 0.5  # bin coords, centers at 0..3
    W = np.zeros((SAMPLES * SAMPLES, D * D), np.float32)
    for s, (bx, by) in enumerate(offs):
        x0, y0 = int(np.floor(bx)), int(np.floor(by))
        fx, fy = bx - x0, by - y0
        for dy in (0, 1):
            for dx in (0, 1):
                x, y = x0 + dx, y0 + dy
                if 0 <= x < D and 0 <= y < D:
                    w = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                    W[s, y * D + x] = w
    return W


_OFFS = jnp.asarray(_sample_offsets_bins(), dtype=jnp.float32)  # (256,2)
_WSP = jnp.asarray(_spatial_weights())  # (256,16)
# Gaussian window over the descriptor (sigma = half the window, in bins)
_GWIN = jnp.asarray(
    np.exp(-np.sum(_sample_offsets_bins() ** 2, axis=-1) / (2 * (0.5 * D) ** 2)).astype(
        np.float32
    )
)


def _bilinear(img, u, v):
    """Bilinear sample img (H,W) at float coords; out-of-bounds -> 0."""
    H, W = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        inside = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        val = img[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
        return jnp.where(inside, val, 0.0)

    return (
        tap(v0i, u0i) * (1 - fu) * (1 - fv)
        + tap(v0i, u0i + 1) * fu * (1 - fv)
        + tap(v0i + 1, u0i) * (1 - fu) * fv
        + tap(v0i + 1, u0i + 1) * fu * fv
    )


def _grad_maps(img, blur_sigma: float = 1.6):
    x = gaussian_blur(img.astype(jnp.float32), blur_sigma)
    dx, dy = sobel_gradients(x)
    return dx, dy


@functools.partial(jax.jit, static_argnames=())
def compute_orientations(img, kps: Keypoints) -> jnp.ndarray:
    """Dominant gradient orientation per keypoint (radians).

    36-bin Gaussian-weighted histogram over a radius ~ 3*1.5*scl region,
    circularly smoothed, parabolic peak interpolation — cv::SIFT's
    calcOrientationHist recipe on a fixed sample grid.
    """
    dx, dy = _grad_maps(img)

    def one(uv, size):
        scl = 0.5 * size
        # fixed 16x16 grid over the orientation window
        r = ORI_RADIUS_BINS * ORI_SIG_FCTR * scl
        lin = (jnp.arange(SAMPLES, dtype=jnp.float32) + 0.5) / SAMPLES * 2 - 1
        gy, gx = jnp.meshgrid(lin * r, lin * r, indexing="ij")
        u = uv[0] + gx.reshape(-1)
        v = uv[1] + gy.reshape(-1)
        gdx = _bilinear(dx, u, v)
        gdy = _bilinear(dy, u, v)
        mag = jnp.sqrt(gdx * gdx + gdy * gdy)
        ori = jnp.arctan2(gdy, gdx)  # [-pi, pi]
        sig = ORI_SIG_FCTR * scl
        w = jnp.exp(-(gx.reshape(-1) ** 2 + gy.reshape(-1) ** 2) / (2 * sig * sig))
        binf = (ori + jnp.pi) / (2 * jnp.pi) * ORI_BINS
        b0 = jnp.floor(binf).astype(jnp.int32) % ORI_BINS
        fb = binf - jnp.floor(binf)
        hist = (
            jnp.zeros(ORI_BINS)
            .at[b0].add(mag * w * (1 - fb))
            .at[(b0 + 1) % ORI_BINS].add(mag * w * fb)
        )
        # circular [1,4,6,4,1]/16 smoothing (OpenCV does two passes of
        # [1,2,1]/4-ish; this matches its effective kernel)
        k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
        idx = (jnp.arange(ORI_BINS)[:, None] + jnp.arange(-2, 3)[None, :]) % ORI_BINS
        hist = jnp.sum(hist[idx] * k[None, :], axis=1)
        peak = jnp.argmax(hist)
        l = hist[(peak - 1) % ORI_BINS]
        c = hist[peak]
        rr = hist[(peak + 1) % ORI_BINS]
        denom = l - 2 * c + rr
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (l - rr) / denom, 0.0)
        off = jnp.clip(off, -0.5, 0.5)
        ang = (peak.astype(jnp.float32) + off + 0.5) / ORI_BINS * 2 * jnp.pi - jnp.pi
        return ang

    return jax.vmap(one)(kps.uv, kps.size)


@functools.partial(jax.jit, static_argnames=("use_orientation",))
def sift_descriptors(img, kps: Keypoints, use_orientation: bool = True):
    """(K,128) float32 descriptors (OpenCV value convention: 512x, saturated).

    Invalid keypoints get zero descriptors.
    """
    dx, dy = _grad_maps(img)
    angles = (
        compute_orientations(img, kps)
        if use_orientation
        else jnp.zeros_like(kps.response)
    )

    def one(uv, size, angle):
        scl = 0.5 * size
        hist_width = SCL_FCTR * scl  # pixels per spatial bin
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        # rotate the static bin-grid into image coords
        ox = _OFFS[:, 0] * hist_width
        oy = _OFFS[:, 1] * hist_width
        u = uv[0] + ca * ox - sa * oy
        v = uv[1] + sa * ox + ca * oy
        gdx = _bilinear(dx, u, v)
        gdy = _bilinear(dy, u, v)
        mag = jnp.sqrt(gdx * gdx + gdy * gdy) * _GWIN
        ori = jnp.arctan2(gdy, gdx) - angle
        binf = (ori / (2 * jnp.pi)) * NBINS
        binf = jnp.mod(binf, NBINS)
        b0 = jnp.floor(binf).astype(jnp.int32)
        fb = binf - b0
        onehot0 = jax.nn.one_hot(b0, NBINS, dtype=jnp.float32)
        onehot1 = jax.nn.one_hot((b0 + 1) % NBINS, NBINS, dtype=jnp.float32)
        contrib = mag[:, None] * (onehot0 * (1 - fb[:, None]) + onehot1 * fb[:, None])
        # (16,256) x (256,8): spatial trilinear scatter as one matmul
        desc = jnp.matmul(_WSP.T, contrib, precision=_HI).reshape(-1)
        # OpenCV post-processing: L2 -> clip 0.2 -> L2 -> 512x saturate
        n = jnp.linalg.norm(desc) + 1e-12
        desc = jnp.clip(desc / n, 0.0, 0.2)
        n = jnp.linalg.norm(desc) + 1e-12
        return jnp.clip(jnp.round(desc / n * 512.0), 0.0, 255.0)

    desc = jax.vmap(one)(kps.uv, kps.size, angles)
    return jnp.where(kps.valid[:, None], desc, 0.0)
