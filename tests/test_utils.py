"""Tests for the debug-check and profiling aux subsystems."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from slam3d_gx_tpu.utils import debug, profiling


def test_checked_catches_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    err, out = debug.checked(f)(jnp.asarray([-1.0]))
    with pytest.raises(Exception):
        err.throw()


def test_checked_passes_clean():
    def f(x):
        return x * 2.0

    err, out = debug.checked(f)(jnp.asarray([1.0, 2.0]))
    err.throw()  # no error
    np.testing.assert_allclose(np.asarray(out), [2.0, 4.0])


def test_strict_raises():
    def f(x):
        return jnp.sqrt(x)

    with pytest.raises(Exception):
        debug.strict(f)(jnp.asarray([-4.0]))


def test_strict_on_pipeline_op():
    """Sanity: a real kernel (matcher) runs clean under strict checks."""
    from slam3d_gx_tpu.ops import match

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    v = jnp.ones(32, bool)
    out = debug.strict(lambda x: match.match_nn(x, v, x, v)[1])(a)
    assert np.isfinite(np.asarray(out)).all()


def test_stage_timer_schema(tmp_path):
    log = str(tmp_path / "time.log")
    t = profiling.StageTimer(log)
    with t.stage("ExtractPlane"):
        _ = sum(range(1000))
    t.start("RANSAC")
    t.stop(sync_array=jnp.ones(4))
    t.write()
    rows = open(log).read().strip().splitlines()
    assert len(rows) == 2
    name, secs = rows[0].split()
    assert name == "ExtractPlane" and float(secs) >= 0


def test_trace_noop_or_works(tmp_path):
    with profiling.trace(str(tmp_path / "tr")) as d:
        _ = jnp.ones(8) * 2
    assert d  # context manager yielded a directory either way
