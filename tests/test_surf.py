"""SURF fast-Hessian detector tests against analytic blob scenes."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from slam3d_gx_tpu.ops.features import surf, registry
from slam3d_gx_tpu.ops import match


def _blob_image(centers_sigmas, h=240, w=320):
    img = np.zeros((h, w))
    yy, xx = np.mgrid[0:h, 0:w]
    for (cy, cx, s) in centers_sigmas:
        img += 200 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return img.astype(np.float32)


def test_detects_blobs_at_location():
    blobs = [(60, 80, 4.0), (120, 200, 6.0), (180, 100, 8.0)]
    img = _blob_image(blobs)
    kps = surf.detect_surf(jnp.asarray(img), max_kp=32)
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    assert len(uv) >= 3
    for (cy, cx, s) in blobs:
        d = np.min(np.hypot(uv[:, 0] - cx, uv[:, 1] - cy))
        assert d < 3.0, f"blob at ({cx},{cy}) missed by {d:.1f}px"


def test_scale_ordering():
    """Bigger blobs must fire at bigger filter sizes."""
    small = _blob_image([(120, 160, 3.0)])
    big = _blob_image([(120, 160, 9.0)])
    k_small = surf.detect_surf(jnp.asarray(small), max_kp=8)
    k_big = surf.detect_surf(jnp.asarray(big), max_kp=8)
    s_small = float(np.asarray(k_small.size)[np.asarray(k_small.valid)][0])
    s_big = float(np.asarray(k_big.size)[np.asarray(k_big.valid)][0])
    assert s_big > s_small


def test_registry_and_matching():
    """SURF detector + SIFT descriptor match a blurred textured pair."""
    rng = np.random.default_rng(0)
    base = ndi.gaussian_filter(rng.random((240, 320)) * 255, 2.5)
    shifted = np.roll(base, (0, 9), axis=(0, 1))
    run = registry.detect_and_describe("SURF", "SIFT", max_kp=128)
    k0, d0 = run(jnp.asarray(base, jnp.float32))
    k1, d1 = run(jnp.asarray(shifted, jnp.float32))
    assert int(np.asarray(k0.valid).sum()) > 20
    idx, dist, ok = match.match_nn(d0, k0.valid, d1, k1.valid)
    good = np.asarray(match.good_match_filter(dist, ok))
    uv0 = np.asarray(k0.uv)[good]
    uv1 = np.asarray(k1.uv)[np.asarray(idx)[good]]
    sel = (uv0[:, 0] < 300)  # ignore wraparound columns
    disp = (uv1 - uv0)[sel]
    med = np.median(disp, axis=0)
    assert abs(med[0] - 9) < 1.5 and abs(med[1]) < 1.5


def test_star_detects_blobs():
    from slam3d_gx_tpu.ops.features import star

    blobs = [(60, 80, 3.0), (120, 200, 5.0), (180, 100, 7.0)]
    img = _blob_image(blobs)
    kps = star.detect_star(jnp.asarray(img), max_kp=32)
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    assert len(uv) >= 3
    for (cy, cx, s) in blobs:
        d = np.min(np.hypot(uv[:, 0] - cx, uv[:, 1] - cy))
        assert d < 3.0, f"blob at ({cx},{cy}) missed by {d:.1f}px"


def test_star_suppresses_lines():
    from slam3d_gx_tpu.ops.features import star

    img = np.zeros((240, 320), np.float32)
    img[:, 150:170] = 200.0  # vertical bar: strong center-surround on edges
    kps = star.detect_star(jnp.asarray(img), max_kp=64)
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    # edge responses along the bar must be suppressed (only bar ends or
    # nothing may fire)
    mid = uv[(uv[:, 1] > 40) & (uv[:, 1] < 200)] if len(uv) else uv
    on_edges = [p for p in mid if abs(p[0] - 150) < 4 or abs(p[0] - 170) < 4]
    assert len(on_edges) <= 2, on_edges
