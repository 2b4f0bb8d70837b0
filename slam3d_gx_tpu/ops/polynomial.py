"""Batched polynomial root finding (Durand-Kerner), jit/vmap/TPU-safe.

Used by the P3P minimal solver (quartics). Durand-Kerner is branch-free
simultaneous iteration in complex arithmetic — it vectorizes over large
hypothesis batches where classical closed forms (Ferrari) need case
analysis that maps poorly onto SIMD lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters",))
def quartic_roots(coeffs, iters: int = 24):
    """Roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    Args:
      coeffs: (..., 5) real, ordered [c4, c3, c2, c1, c0].
    Returns:
      (..., 4) complex64 roots. Degenerate leading coefficients are
      regularized (callers gate on residual checks anyway).
    """
    c4 = coeffs[..., 0]
    # regularize: if |c4| is tiny the quartic is ill-posed; nudge it
    c4 = jnp.where(jnp.abs(c4) > 1e-12, c4, 1e-12)
    p = coeffs[..., 1:] / c4[..., None]  # monic: x^4 + p0 x^3 + p1 x^2 + p2 x + p3
    p = p.astype(jnp.complex64)

    # scale roots to O(1): substitute x = s*y with s from coefficient magnitudes
    mags = jnp.stack(
        [jnp.abs(p[..., k]) ** (1.0 / (k + 1)) for k in range(4)], axis=-1
    )
    s = jnp.clip(jnp.max(mags, axis=-1), 1e-6, None).astype(jnp.complex64)
    powers = jnp.stack([s, s**2, s**3, s**4], axis=-1)
    q = p / powers  # monic quartic in y

    def poly(y):
        return (((y + q[..., 0:1]) * y + q[..., 1:2]) * y + q[..., 2:3]) * y + q[..., 3:4]

    # standard DK initialization (0.4+0.9i)^k
    base = jnp.asarray(0.4 + 0.9j, dtype=jnp.complex64)
    z = jnp.broadcast_to(
        base ** jnp.arange(1, 5, dtype=jnp.float32), q.shape[:-1] + (4,)
    ).astype(jnp.complex64)

    def step(z, _):
        pz = poly(z)
        diff = z[..., :, None] - z[..., None, :]
        eye = jnp.eye(4, dtype=jnp.complex64)
        diff = diff + eye  # avoid 0 on the diagonal
        denom = jnp.prod(diff, axis=-1)
        z = z - pz / denom
        return z, None

    # fully unrolled: each iteration is a handful of tiny (B,4) complex
    # ops — a lax.scan would pay per-step kernel-launch latency, unrolling
    # lets XLA fuse the whole sweep
    z, _ = jax.lax.scan(step, z, None, length=iters, unroll=iters)
    return z * s[..., None]


def real_roots_mask(roots, rel_tol: float = 1e-3):
    """Boolean mask of (approximately) real roots."""
    return jnp.abs(roots.imag) <= rel_tol * (1.0 + jnp.abs(roots.real))
