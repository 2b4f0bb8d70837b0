"""Streaming (chunked on-device) frontend vs the per-frame path."""

import os

import numpy as np
import pytest

from slam3d_gx_tpu.backend import SLAMEnd
from slam3d_gx_tpu.config import CameraIntrinsics, ParameterReader
from slam3d_gx_tpu.testing import synthetic

INTR = CameraIntrinsics(fx=260.0, fy=260.0, cx=160.0, cy=120.0, factor=5000.0)
N = 13  # 12 processed frames; chunk=5 leaves a 2-frame tail path


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream"))
    traj = synthetic.orbit_trajectory(N, radius=0.2, yaw_amp=0.1)
    synthetic.write_dataset(root, synthetic.RoomScene(seed=3), traj, INTR,
                            write_pcd=False)
    return root, traj


def _params(root, **kw):
    over = dict(
        data_source=root, detector_name="GFTT", descriptor_name="SIFT",
        camera_fx=INTR.fx, camera_fy=INTR.fy, camera_cx=INTR.cx,
        camera_cy=INTR.cy, camera_factor=INTR.factor,
        max_keypoints=256, ransac_hypotheses=128,
        max_pos_change=0.05, end_index=100,
    )
    over.update(kw)
    return ParameterReader(None, overrides=over)


def test_streaming_matches_per_frame(dataset, tmp_path_factory):
    from slam3d_gx_tpu.frontend import GraphicEnd2
    from slam3d_gx_tpu.frontend.streaming import StreamingGraphicEnd2

    root, traj = dataset

    d1 = str(tmp_path_factory.mktemp("per_frame"))
    ge = GraphicEnd2(_params(root), data_dir=d1)
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    for _ in range(N - 1):
        ge.run()
    ge.save_final_result()

    d2 = str(tmp_path_factory.mktemp("stream"))
    gs = StreamingGraphicEnd2(_params(root), data_dir=d2, chunk=5)
    slam2 = SLAMEnd()
    gs.init(slam2)
    slam2.init(gs)
    done = gs.run_streaming(N - 1)
    assert done == N - 1
    gs.save_final_result()

    # same decisions (RANSAC streams differ, so allow 1 keyframe slack)
    kf1 = [k.frame_index for k in ge.keyframes]
    kf2 = [k.frame_index for k in gs.keyframes]
    assert abs(len(kf1) - len(kf2)) <= 1, (kf1, kf2)

    # both trajectories hit the ground truth
    for g in (ge, gs):
        est = [g.opt.vertex_estimate(k.id) for k in g.keyframes]
        gt = [traj[k.frame_index - 1] for k in g.keyframes]
        ate = synthetic.ate_rmse(gt, est)
        assert ate < 0.05, ate

    # artifact contracts intact
    for d, g in ((d1, ge), (d2, gs)):
        rows = open(os.path.join(d, "error_of_transform.log")).read().split()
        assert len(rows) == N - 1
        assert os.path.exists(os.path.join(d, "keyframe.txt"))


def test_streaming_planes(tmp_path_factory):
    """StreamingGraphicEnd: the flagship plane pipeline tracked in
    chunks; decisions line up with the per-frame GraphicEnd."""
    from slam3d_gx_tpu.frontend import GraphicEnd
    from slam3d_gx_tpu.frontend.streaming import StreamingGraphicEnd

    root = str(tmp_path_factory.mktemp("pstream"))
    traj = synthetic.orbit_trajectory(N, radius=0.2, yaw_amp=0.1)
    synthetic.write_dataset(root, synthetic.RoomScene(seed=3), traj, INTR,
                            write_pcd=True)
    # full budgets: reduced ones put every pair at the 12-inlier noise
    # floor where key luck, not the streaming logic, decides tracking
    kw = dict(max_keypoints=256, ransac_hypotheses=128)

    ge = GraphicEnd(_params(root, **kw),
                    data_dir=str(tmp_path_factory.mktemp("pf")))
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    for _ in range(N - 1):
        ge.run()

    gs = StreamingGraphicEnd(_params(root, **kw), chunk=5,
                             data_dir=str(tmp_path_factory.mktemp("st")))
    slam2 = SLAMEnd()
    gs.init(slam2)
    slam2.init(gs)
    done = gs.run_streaming(N - 1)
    assert done == N - 1
    gs.save_final_result()

    kf1 = [k.frame_index for k in ge.keyframes]
    kf2 = [k.frame_index for k in gs.keyframes]
    assert abs(len(kf1) - len(kf2)) <= 1, (kf1, kf2)
    est = [gs.opt.vertex_estimate(k.id) for k in gs.keyframes]
    gt = [traj[k.frame_index - 1] for k in gs.keyframes]
    assert synthetic.ate_rmse(gt, est) < 0.06
    rows = open(os.path.join(gs.data_dir,
                             "error_of_transform.log")).read().split()
    assert len(rows) == N - 1


def test_streaming_odometry_edges(dataset, tmp_path_factory):
    """use_odometry in streaming mode: odo_this advances per applied
    frame, so keyframes get the odometry edge at 1/sigma^2 like the
    per-frame path (reference src/GraphicEnd.cpp:330-346)."""
    from slam3d_gx_tpu.frontend.streaming import StreamingGraphicEnd2

    root, traj = dataset
    gs = StreamingGraphicEnd2(_params(root, use_odometry="yes"), chunk=5,
                              data_dir=str(tmp_path_factory.mktemp("odo")))
    slam = SLAMEnd()
    gs.init(slam)
    slam.init(gs)
    gs.run_streaming(N - 1)
    gs.drain_pending_loop_closures()
    info_odo = 1.0 / (0.03**2)
    odo_edges = [e for e in gs.opt.graph.edges
                 if abs(e.information[0, 0] - info_odo) < 1e-6]
    assert len(odo_edges) >= len(gs.keyframes) - 1
    # odometry edges must differ between keyframes (odo_this advanced;
    # before the fix every edge reused the stale chunk-entry pose)
    if len(odo_edges) >= 2:
        assert not np.allclose(odo_edges[0].T, odo_edges[1].T)


def test_streaming_handles_blackout(tmp_path_factory):
    """Frames the tracker cannot register (blackout) trigger the
    per-frame lost_recovery fallback mid-chunk."""
    from slam3d_gx_tpu.frontend.streaming import StreamingGraphicEnd2
    from slam3d_gx_tpu.io import images as img_io

    root = str(tmp_path_factory.mktemp("blackout"))
    traj = synthetic.orbit_trajectory(12, radius=0.2, yaw_amp=0.1)
    synthetic.write_dataset(root, synthetic.RoomScene(seed=3), traj, INTR,
                            write_pcd=False)
    # black out frames 5-7 (after init eats frame 1)
    for i in (5, 6, 7):
        p = os.path.join(root, "rgb_index", f"{i}.png")
        img_io.save_gray(p, np.zeros((240, 320), np.uint8))

    gs = StreamingGraphicEnd2(_params(root, lost_frames=1), chunk=4,
                              data_dir=str(tmp_path_factory.mktemp("d")))
    slam = SLAMEnd()
    gs.init(slam)
    slam.init(gs)
    done = gs.run_streaming(11)
    assert done == 11
    log = open(os.path.join(gs.data_dir,
                            "error_of_transform.log")).read().split()
    assert "9999" in log          # blackout frames went lost
    assert gs.lost <= 1           # recovered after the blackout
    lost_file = os.path.join(gs.data_dir, "lost.txt")
    assert os.path.exists(lost_file)  # lostRecovery actually fired


def test_streaming_chunk1_fused_per_frame(dataset, tmp_path_factory):
    """chunk=1 IS the fused per-frame mode (VERDICT r2 #5): one
    dispatch + one packed readback per frame, with the next frame's
    step speculatively dispatched while this one's records apply."""
    from slam3d_gx_tpu.frontend.streaming import StreamingGraphicEnd2

    root, traj = dataset
    d = str(tmp_path_factory.mktemp("stream1"))
    gs = StreamingGraphicEnd2(_params(root), data_dir=d, chunk=1)
    slam = SLAMEnd()
    gs.init(slam)
    slam.init(gs)
    done = gs.run_streaming(N - 1)
    assert done == N - 1
    gs.save_final_result()

    est = [gs.opt.vertex_estimate(k.id) for k in gs.keyframes]
    gt = [traj[k.frame_index - 1] for k in gs.keyframes]
    assert synthetic.ate_rmse(gt, est) < 0.05
    rows = open(os.path.join(d, "error_of_transform.log")).read().split()
    assert len(rows) == N - 1
