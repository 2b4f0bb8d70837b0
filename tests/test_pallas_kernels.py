"""Pallas kernel tests (run in interpret/fallback mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam3d_gx_tpu.ops import pallas_kernels


def test_histogram_xla_matches_numpy(rng):
    vals = rng.integers(0, 256, 5000).astype(np.float32)
    h = np.asarray(pallas_kernels.histogram256(jnp.asarray(vals)))
    ref = np.bincount(vals.astype(np.int64), minlength=256)
    np.testing.assert_array_equal(h.astype(np.int64), ref)


def test_histogram_empty_bins(rng):
    vals = np.full(1000, 7.0, np.float32)
    h = np.asarray(pallas_kernels.histogram256(jnp.asarray(vals)))
    assert h[7] == 1000 and h.sum() == 1000


def test_histogram_pallas_interpret(rng):
    """The pallas path itself, via the interpreter on CPU."""
    from jax.experimental import pallas as pl  # noqa: F401

    vals = rng.integers(0, 256, pallas_kernels.TILE_PX * 3 + 17).astype(np.float32)
    flat = jnp.asarray(vals)
    # monkey-run the pallas kernel in interpret mode
    import functools
    from jax.experimental import pallas
    orig = pallas.pallas_call
    try:
        pallas.pallas_call = functools.partial(orig, interpret=True)
        h = np.asarray(pallas_kernels._histogram256_pallas(flat))
    finally:
        pallas.pallas_call = orig
    ref = np.bincount(vals.astype(np.int64), minlength=256)
    np.testing.assert_array_equal(h.astype(np.int64), ref)


def test_apply_lut_fallback(rng):
    vals = rng.integers(0, 256, (37, 53)).astype(np.float32)
    lut = rng.integers(0, 256, 256).astype(np.float32)
    out = np.asarray(pallas_kernels.apply_lut256(jnp.asarray(vals), jnp.asarray(lut)))
    np.testing.assert_array_equal(out, lut[vals.astype(np.int64)])


def test_apply_lut_pallas_interpret(rng):
    import functools
    from jax.experimental import pallas
    vals = rng.integers(0, 256, 3000).astype(np.float32)
    lut = np.sort(rng.integers(0, 256, 256)).astype(np.float32)
    orig = pallas.pallas_call
    try:
        pallas.pallas_call = functools.partial(orig, interpret=True)
        out = np.asarray(pallas_kernels._apply_lut256_pallas(
            jnp.asarray(vals), jnp.asarray(lut)))
    finally:
        pallas.pallas_call = orig
    np.testing.assert_array_equal(out, lut[vals.astype(np.int64)])


def test_min_eig_fused_matches_xla(rng):
    import functools
    from jax.experimental import pallas
    from slam3d_gx_tpu.ops.features import harris

    img = jnp.asarray(rng.normal(size=(48, 200)).astype(np.float32) * 50)
    ref = np.asarray(harris.min_eig_response(img))
    orig = pallas.pallas_call
    try:
        pallas.pallas_call = functools.partial(orig, interpret=True)
        got = np.asarray(pallas_kernels.min_eig_response_fused(
            img, use_pallas=True))
    finally:
        pallas.pallas_call = orig
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)
