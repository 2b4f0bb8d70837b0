"""Batched RANSAC PnP: P3P minimal solves + Gauss-Newton refinement.

TPU-native replacement for cv::solvePnPRansac (14 reference call sites,
e.g. src/GraphicEnd.cpp:542,595,615; SURVEY.md §2.2). The reference's
sequential 100-iteration RANSAC becomes one batch of B hypotheses:

  sample B 3-point subsets -> Grunert P3P quartics (Durand-Kerner roots)
  -> up to 4B candidate poses -> score every candidate against all N
  correspondences with one batched projection -> argmax inliers ->
  masked Gauss-Newton polish on the winner's inliers.

Coplanar points are fine (P3P doesn't degenerate like DLT/EPnP), which the
per-plane PnP of the plane pipeline requires (reference pnp() feeds points
from a single RANSAC plane, src/GraphicEnd.cpp:522-554).

`useExtrinsicGuess` semantics (second refinement pass at 3px,
src/GraphicEnd.cpp:615): the guess joins the hypothesis pool and the final
polish starts from the best model, exactly the role the guess plays in
OpenCV's implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .polynomial import quartic_roots, real_roots_mask

_HI = jax.lax.Precision.HIGHEST


class PnPResult(NamedTuple):
    rvec: jnp.ndarray      # (3,)
    tvec: jnp.ndarray      # (3,)
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray        # () bool — a model with >= 4 inliers was found


# ---------------------------------------------------------------------------
# P3P (Grunert) — batched
# ---------------------------------------------------------------------------


def _kabsch(P, X):
    """Rigid transform world->camera from paired triplets.

    P, X: (...,3,3) rows are points. Returns R (...,3,3), t (...,3) with
    X ~= P @ R^T + t.

    TPU note: batched tiny SVDs (jnp.linalg.svd on (...,3,3)) lower to a
    slow sequential path. P3P triplets are *exact* correspondences by
    construction (the minimal solver places the 3 world points in the
    camera frame), so least-squares is unnecessary: align the triangles'
    orthonormal frames directly — closed-form cross products, fully
    batched. Degenerate (near-collinear) triplets produce garbage poses
    that the RANSAC inlier scoring discards.
    """

    def frame(A):
        e1 = A[..., 1, :] - A[..., 0, :]
        e1 = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-12)
        v2 = A[..., 2, :] - A[..., 0, :]
        v2 = v2 - jnp.sum(v2 * e1, axis=-1, keepdims=True) * e1
        e2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1)  # columns are the frame

    Ep = frame(P)
    Ex = frame(X)
    R = jnp.matmul(Ex, jnp.swapaxes(Ep, -1, -2), precision=_HI)
    cP = P.mean(axis=-2)
    cX = X.mean(axis=-2)
    t = cX - jnp.matmul(R, cP[..., None], precision=_HI)[..., 0]
    return R, t


def p3p_grunert(P, f):
    """Grunert's P3P: world triplets + unit bearing triplets -> candidates.

    Args:
      P: (B,3,3) world points (rows); f: (B,3,3) unit bearing vectors.
    Returns:
      R: (B,S,3,3), t: (B,S,3), valid: (B,S) — S=12 candidate slots
      (4 quartic roots x 3 Newton seeds; duplicates are harmless, the
      RANSAC scorer just re-ranks them).
    """
    P1, P2, P3 = P[:, 0], P[:, 1], P[:, 2]
    f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2]

    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    ca = jnp.sum(f2 * f3, axis=-1)  # cos(alpha)
    cb = jnp.sum(f1 * f3, axis=-1)  # cos(beta)
    cg = jnp.sum(f1 * f2, axis=-1)  # cos(gamma)

    b2s = jnp.where(b2 > 1e-12, b2, 1e-12)
    A = a2 / b2s
    B = c2 / b2s
    amc = (a2 - c2) / b2s  # (a^2 - c^2)/b^2

    # Haralick et al., Grunert quartic coefficients in v (s3 = v s1)
    A4 = (amc - 1.0) ** 2 - 4.0 * B * ca**2
    A3 = 4.0 * (
        amc * (1.0 - amc) * cb
        - (1.0 - (A + B)) * ca * cg
        + 2.0 * B * ca**2 * cb
    )
    A2 = 2.0 * (
        amc**2
        - 1.0
        + 2.0 * amc**2 * cb**2
        + 2.0 * (1.0 - B) * ca**2
        - 4.0 * (A + B) * ca * cb * cg
        + 2.0 * (1.0 - A) * cg**2
    )
    A1 = 4.0 * (
        -amc * (1.0 + amc) * cb
        + 2.0 * A * cg**2 * cb
        - (1.0 - (A + B)) * ca * cg
    )
    A0 = (1.0 + amc) ** 2 - 4.0 * A * cg**2

    coeffs = jnp.stack([A4, A3, A2, A1, A0], axis=-1)
    roots = quartic_roots(coeffs)  # (B,4) complex

    is_real = real_roots_mask(roots, rel_tol=5e-2)
    v = roots.real
    # triple each root with +/- perturbed seeds: near-double roots (f32
    # root finding resolves them only to ~sqrt(eps)) can collapse into one
    # Newton basin below; the offset seeds recover the sibling branch
    v = jnp.concatenate([v, v + 4e-3, v - 4e-3], axis=-1)  # (B,12)
    is_real = jnp.tile(is_real, (1, 3))
    v_ok = is_real & (v > 1e-6)

    # u from the relation (Haralick eq. between the two conics)
    denom_u = 2.0 * (cg[:, None] - v * ca[:, None])
    u = (
        (-1.0 + amc[:, None]) * v**2
        - 2.0 * amc[:, None] * cb[:, None] * v
        + 1.0
        + amc[:, None]
    ) / jnp.where(jnp.abs(denom_u) > 1e-9, denom_u, 1e-9)

    # Newton-polish (u,v) on the original law-of-cosine constraints —
    # far better conditioned than the quartic near double roots (which
    # f32 root finding only resolves to ~sqrt(eps)):
    #   F1 = (u^2+v^2-2uv ca) - A (1+v^2-2v cb)
    #   F2 = (1+u^2-2u cg)    - B (1+v^2-2v cb)
    Ac = A[:, None]
    Bc = B[:, None]
    cac, cbc, cgc = ca[:, None], cb[:, None], cg[:, None]
    for _ in range(4):
        F1 = (u * u + v * v - 2 * u * v * cac) - Ac * (1 + v * v - 2 * v * cbc)
        F2 = (1 + u * u - 2 * u * cgc) - Bc * (1 + v * v - 2 * v * cbc)
        j11 = 2 * u - 2 * v * cac
        j12 = 2 * v - 2 * u * cac - Ac * (2 * v - 2 * cbc)
        j21 = 2 * u - 2 * cgc
        j22 = -Bc * (2 * v - 2 * cbc)
        det = j11 * j22 - j12 * j21
        det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
        u = u - (j22 * F1 - j12 * F2) / det
        v = v - (-j21 * F1 + j11 * F2) / det

    s1sq = b2s[:, None] / (1.0 + v**2 - 2.0 * v * cb[:, None])
    s1 = jnp.sqrt(jnp.clip(s1sq, 1e-12, None))
    s2 = u * s1
    s3 = v * s1
    valid = v_ok & (u > 1e-6) & (s1sq > 1e-12)

    # camera-frame points, then absolute orientation
    X = jnp.stack(
        [
            s1[..., None] * f1[:, None, :],
            s2[..., None] * f2[:, None, :],
            s3[..., None] * f3[:, None, :],
        ],
        axis=-2,
    )  # (B,4,3,3)
    Pb = jnp.broadcast_to(P[:, None], X.shape)
    R, t = _kabsch(Pb, X)
    return R, t, valid


# ---------------------------------------------------------------------------
# projection + scoring
# ---------------------------------------------------------------------------


def _project(R, t, pts, fx, fy, cx, cy):
    """R (...,3,3), t (...,3), pts (N,3) -> (...,N,2) pixels."""
    pc = jnp.einsum("...ij,nj->...ni", R, pts, precision=_HI) + t[..., None, :]
    z = pc[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = pc[..., 0] * fx / safe_z + cx
    v = pc[..., 1] * fy / safe_z + cy
    return jnp.stack([u, v], axis=-1), z


def reprojection_errors(rvec, tvec, obj, img, fx, fy, cx, cy):
    R = lie.rodrigues(rvec)
    uv, z = _project(R, tvec, obj, fx, fy, cx, cy)
    err = jnp.linalg.norm(uv - img, axis=-1)
    return jnp.where(z > 0, err, jnp.inf)


# ---------------------------------------------------------------------------
# Gauss-Newton refinement on SE(3)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_pnp(rvec, tvec, obj, img, weights, fx, fy, cx, cy, iters: int = 10):
    """Levenberg-damped Gauss-Newton on the reprojection objective.

    weights: (N,) float (0 masks a correspondence out).
    """
    def residuals(x):
        rv, tv = x[:3], x[3:]
        R = lie.rodrigues(rv)
        uv, z = _project(R, tv, obj, fx, fy, cx, cy)
        r = (uv - img) * jnp.sqrt(weights)[:, None]
        return jnp.where(jnp.isfinite(r), r, 0.0).reshape(-1)

    jac_fn = jax.jacfwd(residuals)

    def step(carry, _):
        x, lam, e = carry
        r = residuals(x)
        J = jac_fn(x)
        H = jnp.matmul(J.T, J, precision=_HI)
        g = J.T @ r
        H = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
        dx = jnp.linalg.solve(H, -g)
        x_new = x + dx
        e_new = jnp.sum(residuals(x_new) ** 2)
        better = e_new < e
        x = jnp.where(better, x_new, x)
        e = jnp.where(better, e_new, e)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return (x, lam, e), None

    x0 = jnp.concatenate([rvec, tvec])
    e0 = jnp.sum(residuals(x0) ** 2)
    # unrolled: per-step ops are tiny (6x6 solve + one (2N,6) jacobian);
    # scan would pay per-step launch latency
    (x, _, _), _ = jax.lax.scan(
        step, (x0, jnp.float32(1e-3), e0), None, length=iters, unroll=iters
    )
    return x[:3], x[3:]


# ---------------------------------------------------------------------------
# full RANSAC PnP
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("hypotheses", "refine_iters")
)
def solve_pnp_ransac(
    obj,
    img,
    mask,
    fx,
    fy,
    cx,
    cy,
    key,
    reproj_thresh: float = 8.0,
    hypotheses: int = 256,
    min_inliers: int = 4,
    refine_iters: int = 10,
    guess_rvec=None,
    guess_tvec=None,
) -> PnPResult:
    """obj (N,3) world, img (N,2) pixels, mask (N,) valid correspondences.

    Mirrors cv::solvePnPRansac's contract: inlier set of the best model at
    `reproj_thresh`, pose refined on those inliers. When a guess is given
    it competes as an extra hypothesis (useExtrinsicGuess analog).
    """
    N = obj.shape[0]
    obj = obj.astype(jnp.float32)
    img = img.astype(jnp.float32)
    w = mask.astype(jnp.float32)

    # bearings
    x = (img[:, 0] - cx) / fx
    y = (img[:, 1] - cy) / fy
    f = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    # sample triplets of valid correspondences
    logits = jnp.where(mask, 0.0, -1e30)
    idx = jax.random.categorical(key, logits, shape=(hypotheses, 3))
    P = obj[idx]  # (B,3,3)
    F = f[idx]
    # degenerate samples (repeated indices) -> invalid
    distinct = (
        (idx[:, 0] != idx[:, 1]) & (idx[:, 0] != idx[:, 2]) & (idx[:, 1] != idx[:, 2])
    )

    R, t, valid = p3p_grunert(P, F)  # (B,4,·)
    valid = valid & distinct[:, None]
    Rf = R.reshape(-1, 3, 3)
    tf = t.reshape(-1, 3)
    vf = valid.reshape(-1)

    if guess_rvec is not None:
        Rg = lie.rodrigues(guess_rvec.astype(jnp.float32))[None]
        Rf = jnp.concatenate([Rf, Rg], axis=0)
        tf = jnp.concatenate([tf, guess_tvec.astype(jnp.float32)[None]], axis=0)
        vf = jnp.concatenate([vf, jnp.array([True])], axis=0)

    uv, z = _project(Rf, tf, obj, fx, fy, cx, cy)
    err = jnp.linalg.norm(uv - img[None], axis=-1)
    good = (err < reproj_thresh) & (z > 0) & mask[None, :]
    counts = jnp.where(vf, good.sum(axis=1), -1)
    best = jnp.argmax(counts)

    inl0 = good[best]
    rv0 = lie.inv_rodrigues(Rf[best])
    tv0 = tf[best]

    rv, tv = refine_pnp(
        rv0, tv0, obj, img, inl0.astype(jnp.float32), fx, fy, cx, cy,
        iters=refine_iters,
    )
    err_f = reprojection_errors(rv, tv, obj, img, fx, fy, cx, cy)
    inliers = (err_f < reproj_thresh) & mask
    n_inl = inliers.sum()
    ok = (counts[best] >= min_inliers) & (n_inl >= min_inliers)
    return PnPResult(rvec=rv, tvec=tv, inliers=inliers, n_inliers=n_inl, ok=ok)
