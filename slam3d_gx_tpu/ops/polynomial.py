"""Batched polynomial root finding (Durand-Kerner), jit/vmap/TPU-safe.

Used by the P3P minimal solver (quartics). Durand-Kerner is branch-free
simultaneous iteration in complex arithmetic — it vectorizes over large
hypothesis batches where classical closed forms (Ferrari) need case
analysis that maps poorly onto SIMD lanes.

Layout note: every intermediate keeps the BATCH axis minor (the four
roots are tracked as four separate (...,) complex arrays, not one
(...,4) tensor). A trailing root axis of 4 is lane-padded 32x on TPU
registers and the 24-iteration unrolled sweep amplifies that into the
dominant memory cost of the P3P stage (measured round 5: the padded
form made quartic+P3P ~75us/solve, ~55% of the whole RANSAC solve).
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
    # monic coefficients as four separate (...,) complex arrays
    p = [(coeffs[..., k] / c4).astype(jnp.complex64) for k in range(1, 5)]

    # scale roots to O(1): substitute x = s*y with s from coefficient
    # magnitudes
    s = jnp.clip(
        jnp.maximum(
            jnp.maximum(jnp.abs(p[0]), jnp.abs(p[1]) ** 0.5),
            jnp.maximum(jnp.abs(p[2]) ** (1.0 / 3.0),
                        jnp.abs(p[3]) ** 0.25),
        ),
        1e-6,
        None,
    ).astype(jnp.complex64)
    q = [p[0] / s, p[1] / s**2, p[2] / s**3, p[3] / s**4]

    def poly(y):
        return (((y + q[0]) * y + q[1]) * y + q[2]) * y + q[3]

    # standard DK initialization (0.4+0.9i)^k
    base = jnp.asarray(0.4 + 0.9j, dtype=jnp.complex64)
    shape = q[0].shape
    z = [jnp.broadcast_to(base ** (k + 1), shape).astype(jnp.complex64)
         for k in range(4)]

    def step(z, _):
        z0, z1, z2, z3 = z
        n0 = z0 - poly(z0) / ((z0 - z1) * (z0 - z2) * (z0 - z3))
        n1 = z1 - poly(z1) / ((z1 - z0) * (z1 - z2) * (z1 - z3))
        n2 = z2 - poly(z2) / ((z2 - z0) * (z2 - z1) * (z2 - z3))
        n3 = z3 - poly(z3) / ((z3 - z0) * (z3 - z1) * (z3 - z2))
        return (n0, n1, n2, n3), None

    # fully unrolled: each iteration is a handful of (...,)-shaped
    # complex ops — a lax.scan would pay per-step kernel-launch latency,
    # unrolling lets XLA fuse the whole sweep. DK's only division
    # hazard is coincident iterates; the distinct initial powers keep
    # them separated in exact arithmetic and jitter from f32 rounding
    # in practice (same contract as the previous (...,4) formulation,
    # whose +eye diagonal only guarded the self-difference).
    z, _ = jax.lax.scan(step, tuple(z), None, length=iters, unroll=iters)
    return jnp.stack(z, axis=-1) * s[..., None]


def real_roots_mask(roots, rel_tol: float = 1e-3):
    """Boolean mask of (approximately) real roots."""
    return jnp.abs(roots.imag) <= rel_tol * (1.0 + jnp.abs(roots.real))
