"""Unit tests for the loop_closure_max_drift consistency gate.

The lc_audit harness measured a 1.8% class of accepted loop edges with
~1.3 m translation error from perceptual aliasing (wrong-but-consistent
registrations that pass the reference's norm/inlier gates,
src/GraphicEnd.cpp:739-760). The gate compares the measurement against
the frontend's running-pose prediction; off by default (reference
parity)."""

import numpy as np

from slam3d_gx_tpu.config import ParameterReader
from slam3d_gx_tpu.frontend.state import Keyframe
from slam3d_gx_tpu.geometry import se3


class _GateHost:
    """Just the gate's state surface — no pipeline construction."""

    _lc_within_drift = __import__(
        "slam3d_gx_tpu.frontend.graphic_end",
        fromlist=["GraphicEnd"]).GraphicEnd._lc_within_drift

    def __init__(self, max_drift):
        self.lc_max_drift = max_drift
        self._kf_pose = {}


def _mk(i, pose, host):
    kf = Keyframe(id=i, frame_index=i + 1, features=None)
    host._kf_pose[i] = np.asarray(pose, float)
    return kf


def test_gate_off_accepts_everything():
    h = _GateHost(0.0)
    a, b = _mk(0, np.eye(4), h), _mk(1, np.eye(4), h)
    Z = se3.make_isometry(np.eye(3), [5.0, 0, 0])
    assert h._lc_within_drift(a, b, Z)


def test_gate_accepts_consistent_and_rejects_aliased():
    h = _GateHost(0.5)
    Ta = np.eye(4)
    Tb = se3.make_isometry(se3.rodrigues([0, 0.1, 0]), [0.3, 0.0, 0.1])
    a, b = _mk(0, Ta, h), _mk(1, Tb, h)
    Z_true = se3.inverse(Ta) @ Tb
    assert h._lc_within_drift(a, b, Z_true)
    # small drift-scale deviation still accepted
    Z_drift = Z_true.copy()
    Z_drift[:3, 3] += [0.05, 0.02, -0.03]
    assert h._lc_within_drift(a, b, Z_drift)
    # the measured aliasing class (~1.3 m off) is rejected
    Z_alias = Z_true.copy()
    Z_alias[:3, 3] += [1.3, 0.0, 0.0]
    assert not h._lc_within_drift(a, b, Z_alias)


def test_gate_permissive_without_pose_hints():
    h = _GateHost(0.5)
    a = Keyframe(id=7, frame_index=8, features=None)  # no hint recorded
    b = _mk(1, np.eye(4), h)
    Z = se3.make_isometry(np.eye(3), [9.0, 0, 0])
    assert h._lc_within_drift(a, b, Z)


def test_config_key_default_off():
    p = ParameterReader(None, overrides={})
    assert p.get_float("loop_closure_max_drift") == 0.0
