"""End-to-end SLAM integration tests on synthetic RGB-D scenes.

Covers the reference's workflow (README:43-78): run SLAM -> final.g2o /
keyframe.txt / final_after.g2o -> generateTrajectory -> saveOutput, with
ATE checked against the synthetic ground truth.
"""

import os

import numpy as np
import pytest

from slam3d_gx_tpu.backend import SLAMEnd
from slam3d_gx_tpu.config import CameraIntrinsics, ParameterReader
from slam3d_gx_tpu.geometry import se3
from slam3d_gx_tpu.io import pcd as pcd_io, tum
from slam3d_gx_tpu.testing import synthetic

INTR = CameraIntrinsics(fx=260.0, fy=260.0, cx=160.0, cy=120.0, factor=5000.0)
N_FRAMES = 12


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("room"))
    scene = synthetic.RoomScene(seed=3)
    traj = synthetic.orbit_trajectory(N_FRAMES, radius=0.2, yaw_amp=0.1)
    synthetic.write_dataset(root, scene, traj, INTR, write_pcd=True)
    return root, traj


def make_params(root, **kw):
    over = dict(
        data_source=root, detector_name="GFTT", descriptor_name="SIFT",
        camera_fx=INTR.fx, camera_fy=INTR.fy, camera_cx=INTR.cx,
        camera_cy=INTR.cy, camera_factor=INTR.factor,
        max_keypoints=256, ransac_hypotheses=128,
        max_pos_change=0.05, end_index=100, grid_leaf=0.05,
    )
    over.update(kw)
    return ParameterReader(None, overrides=over)


@pytest.fixture(scope="module")
def imageonly_run(dataset, tmp_path_factory):
    from slam3d_gx_tpu.frontend import GraphicEnd2

    root, traj = dataset
    datadir = str(tmp_path_factory.mktemp("data_img"))
    ge = GraphicEnd2(make_params(root), data_dir=datadir)
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    for _ in range(N_FRAMES - 1):
        ge.run()
    slam.globalOptimizer.save(os.path.join(datadir, "final.g2o"))
    ge.save_final_result()
    return ge, slam, datadir, traj, root


def test_imageonly_tracks_and_closes_loops(imageonly_run):
    ge, slam, datadir, traj, root = imageonly_run
    assert len(ge.keyframes) >= 5
    est = [ge.opt.vertex_estimate(kf.id) for kf in ge.keyframes]
    gt = [traj[kf.frame_index - 1] for kf in ge.keyframes]
    ate = synthetic.ate_rmse(gt, est)
    assert ate < 0.05, f"ATE {ate}"


def test_imageonly_artifacts(imageonly_run):
    ge, slam, datadir, traj, root = imageonly_run
    # error log: one row per run() call
    log = open(os.path.join(datadir, "error_of_transform.log")).read().split()
    assert len(log) == N_FRAMES - 1
    kf = tum.read_keyframes(os.path.join(datadir, "keyframe.txt"))
    assert [k for k, _ in kf] == list(range(len(ge.keyframes)))
    # pre- and post-optimization graphs parse
    from slam3d_gx_tpu.io import g2o_io

    g_pre = g2o_io.load_g2o(os.path.join(datadir, "final.g2o"))
    g_post = g2o_io.load_g2o(os.path.join(datadir, "final_after.g2o"))
    assert set(g_pre.vertices) == set(g_post.vertices)
    assert g_pre.vertices[0].fixed
    assert len(g_pre.edges) >= len(ge.keyframes) - 1


def test_generate_trajectory_cli(imageonly_run):
    from slam3d_gx_tpu.cli import generate_trajectory

    ge, slam, datadir, traj, root = imageonly_run
    out = os.path.join(datadir, "trajectory.txt")
    rc = generate_trajectory.generate(
        os.path.join(datadir, "keyframe.txt"),
        os.path.join(datadir, "final_after.g2o"),
        params=make_params(root),
        out_path=out,
    )
    assert rc == 0
    rows = tum.read_trajectory(out)
    assert len(rows) == len(ge.keyframes)
    # timestamps must match the associate.txt rows of the keyframe frames
    asso = tum.read_associate(os.path.join(root, "associate.txt"))
    for (ts, pose7), kf in zip(rows, ge.keyframes):
        assert abs(ts - float(asso[kf.frame_index - 1].rgb_ts)) < 1e-6


def test_planes_pipeline_e2e(dataset, tmp_path_factory):
    from slam3d_gx_tpu.frontend import GraphicEnd

    root, traj = dataset
    datadir = str(tmp_path_factory.mktemp("data_planes"))
    # smaller kernels: the plane pipeline's CPU compile dominates suite
    # wall time, and this test checks behavior, not capacity. At this
    # reduced max_keypoints the frame-scope shared budget is too thin
    # for reliable tracking, so give it the per-plane-parity budget.
    ge = GraphicEnd(make_params(root, max_keypoints=128,
                                ransac_hypotheses=64,
                                frame_kp_budget=384), data_dir=datadir)
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    n = 5
    for _ in range(n):
        ge.run()
    assert ge.lost == 0
    assert len(ge.keyframes) >= 3
    ge.save_final_result()
    est = [ge.opt.vertex_estimate(kf.id) for kf in ge.keyframes]
    gt = [traj[kf.frame_index - 1] for kf in ge.keyframes]
    ate = synthetic.ate_rmse(gt, est)
    assert ate < 0.06, f"ATE {ate}"
    # planes were actually found
    feats = ge.keyframes[-1].features
    assert int(np.asarray(feats.plane_valid).sum()) >= 1


def test_planes_pipeline_splat_and_voxel_knobs(dataset, tmp_path_factory):
    """Escape hatches (CLAUDE.md conventions): plane_image_mode=splat
    restores the reference's point splatting (src/GraphicEnd.cpp:390-420)
    and voxel_downsample_clouds=1 restores its VoxelGrid(grid_leaf)
    downsample before plane RANSAC (287-295). Both must track."""
    from slam3d_gx_tpu.frontend import GraphicEnd

    root, traj = dataset
    datadir = str(tmp_path_factory.mktemp("data_splat"))
    # splat coverage is patchier than the analytic membership images
    # (it paints only where voxel points project), so this config needs
    # the full keypoint budget to track reliably at test scale
    ge = GraphicEnd(make_params(
        root, plane_image_mode="splat", voxel_downsample_clouds=1,
    ), data_dir=datadir)
    slam = SLAMEnd()
    ge.init(slam)
    slam.init(ge)
    for _ in range(3):
        ge.run()
    assert ge.lost == 0
    feats = ge.keyframes[-1].features
    assert int(np.asarray(feats.plane_valid).sum()) >= 1
    assert int(np.asarray(feats.kp_valid).sum()) > 0


def test_exp1_cli_visual_artifacts(dataset, tmp_path, monkeypatch):
    """exp1 emits headless PNGs for the reference's imshow windows
    (exp1.cpp:388,580,678-682): plane images + per-plane match/inlier
    match images in `p` mode, match/inlier images in `n` mode."""
    from slam3d_gx_tpu.cli import exp1

    root, traj = dataset
    monkeypatch.chdir(tmp_path)
    with open("parameters.yaml", "w") as f:
        for k, v in dict(
            data_source=root, detector_name="GFTT", descriptor_name="SIFT",
            camera_fx=INTR.fx, camera_fy=INTR.fy, camera_cx=INTR.cx,
            camera_cy=INTR.cy, camera_factor=INTR.factor,
            max_keypoints=128, ransac_hypotheses=64, end_index=100,
        ).items():
            f.write(f"{k}: {v}\n")
    assert exp1.main(["1", "2", "GFTT", "SIFT", "p"]) == 0
    assert os.path.exists("data/exp1/plane_1_0.png")
    assert os.path.exists("data/exp1/plane_2_0.png")
    assert os.path.exists("data/exp1/plane_match_1_2_0.png")
    assert os.path.exists("data/exp1/plane_inliers_1_2_0.png")
    assert exp1.main(["1", "2", "GFTT", "SIFT", "n"]) == 0
    assert os.path.exists("data/exp1/match_1_2.png")
    assert os.path.exists("data/exp1/inliers_1_2.png")
    # error.log carries one row per run, exp1_2 schema
    rows = open("data/exp1/error.log").read().strip().splitlines()
    assert len(rows) == 2 and all(len(r.split()) == 7 for r in rows)
    # the match canvas is the two 320px frames side by side and non-empty
    from slam3d_gx_tpu.io import images as img_io
    m = img_io.load_gray("data/exp1/plane_match_1_2_0.png")
    assert m.shape == (240, 640)
    assert int((m > 0).sum()) > 100


def test_save_output_cli(imageonly_run):
    from slam3d_gx_tpu.cli import save_output

    ge, slam, datadir, traj, root = imageonly_run
    out = os.path.join(datadir, "result.pcd")
    rc = save_output.fuse_map(
        os.path.join(datadir, "keyframe.txt"),
        os.path.join(datadir, "final_after.g2o"),
        pass_z=5.0,
        params=make_params(root),
        out_path=out,
    )
    assert rc == 0
    xyz, rgba = pcd_io.read_pcd(out)
    assert len(xyz) > 1000
    # fused map should span the room walls (world frame ~ first camera)
    assert xyz[:, 2].max() > 2.5
    # back wall should fuse consistently: points near z=3.2 plane
    back = xyz[np.abs(xyz[:, 2] - 3.2) < 0.1]
    assert len(back) > 100


def test_view_lc_cli(imageonly_run, tmp_path):
    from slam3d_gx_tpu.cli import view_lc

    ge, slam, datadir, traj, root = imageonly_run
    lc = os.path.join(datadir, "lc.txt")
    if not os.path.exists(lc):
        pytest.skip("no loop closures recorded in this run")
    out = str(tmp_path / "lcview")
    rc = view_lc.view(lc, params=make_params(root), out_dir=out)
    assert rc == 0
    assert len(os.listdir(out)) > 0

def test_eval_protocol_with_tum_tools(imageonly_run, tmp_path_factory):
    """BASELINE.md protocol: SLAM -> trajectory.txt -> TUM evaluation
    tools (tools/evaluate_rpe.py, evaluate_ate.py) against ground truth."""
    import subprocess
    import sys

    from slam3d_gx_tpu.cli import generate_trajectory
    from slam3d_gx_tpu.geometry import se3

    ge, slam, datadir, traj, root = imageonly_run
    out = str(tmp_path_factory.mktemp("eval"))
    est_path = os.path.join(out, "trajectory.txt")
    rc = generate_trajectory.generate(
        os.path.join(datadir, "keyframe.txt"),
        os.path.join(datadir, "final_after.g2o"),
        params=make_params(root), out_path=est_path,
    )
    assert rc == 0

    # ground truth in TUM format from the synthetic trajectory
    asso = tum.read_associate(os.path.join(root, "associate.txt"))
    gt_path = os.path.join(out, "groundtruth.txt")
    with open(gt_path, "w") as f:
        for row, T in zip(asso, traj):
            d = se3.get_estimate_data(T)
            f.write(f"{row.rgb_ts} " + " ".join(f"{v:.9g}" for v in d) + "\n")

    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    r = subprocess.run(
        [sys.executable, os.path.join(tools, "evaluate_ate.py"),
         gt_path, est_path, "--verbose"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ate = float([l for l in r.stdout.splitlines() if ".rmse" in l][0].split()[1])
    assert ate < 0.05, f"ATE vs TUM tool: {ate}"

    r = subprocess.run(
        [sys.executable, os.path.join(tools, "evaluate_rpe.py"),
         gt_path, est_path, "--fixed_delta", "--delta", "0.1", "--verbose"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    rpe = float([l for l in r.stdout.splitlines()
                 if "translational_error.rmse" in l][0].split()[1])
    assert rpe < 0.05, f"RPE vs TUM tool: {rpe}"


def test_bulk_scan_verdicts_match_single_pair(imageonly_run):
    """find_more_loops fills the verdict cache via the bulk per-source
    scan (graphic_end._scan_source); each cached verdict must agree
    with a direct single-pair registration (the sequential fallback
    path, graphic_end.check) — same pair order, same gates."""
    from slam3d_gx_tpu.frontend.state import result_to_host

    ge = imageonly_run[0]
    items = list(ge._check_cache.items())
    assert items, "bulk scan populated no verdicts"
    step = max(1, len(items) // 10)
    checked = 0
    for (src, tgt), (passed, _T) in items[::step][:10]:
        res = ge.multipnp(
            ge.keyframes[src].features, ge.keyframes[tgt].features,
            ge.next_key(), ge.loop_closure_inliers)
        _, norm, inl, ok = result_to_host(res)
        # the two paths draw different RANSAC keys, so verdicts are only
        # deterministic away from the gates: skip pairs whose fresh draw
        # lands within a margin of either threshold
        near_gate = (
            abs(float(inl) - ge.loop_closure_inliers) <= 2
            or abs(float(norm) - ge.loop_closure_error)
            <= 0.1 * ge.loop_closure_error
        )
        if near_gate:
            continue
        checked += 1
        single = (bool(ok) and norm <= ge.loop_closure_error
                  and inl >= ge.loop_closure_inliers)
        assert single == passed, (
            f"pair ({src},{tgt}): bulk={passed} single={single} "
            f"(norm {norm:.3f}, inliers {inl})")
    assert checked >= 3, "too few decisive pairs to compare"


def test_finalize_prefilter_edge_equivalence(dataset, tmp_path_factory):
    """finalize_prefilter (VERDICT r4 #4): with the knob at or above the
    keyframe count nothing is pruned and the finalize edge set must be
    EXACTLY the exact-scan run's (same seed -> same key sequence ->
    same verdicts); with a tight limit the pre-filter must actually
    prune registrations while keeping every keyframe constrained."""
    from slam3d_gx_tpu.frontend import GraphicEnd2

    root, traj = dataset

    def run(**kw):
        datadir = str(tmp_path_factory.mktemp("data_pf"))
        ge = GraphicEnd2(make_params(root, **kw), data_dir=datadir)
        slam = SLAMEnd()
        ge.init(slam)
        slam.init(ge)
        for _ in range(N_FRAMES - 1):
            ge.run()
        ge.save_final_result()
        return ge, sorted((e.id1, e.id2) for e in ge.opt.graph.edges)

    ge0, edges_exact = run(finalize_prefilter=0)
    k = len(ge0.keyframes)
    ge1, edges_wide = run(finalize_prefilter=max(k, 4))
    assert edges_wide == edges_exact, (
        "no-prune prefilter changed the finalize edge set")
    assert getattr(ge1, "_prefilter_pruned", 0) == 0

    ge2, edges_tight = run(finalize_prefilter=2)
    assert getattr(ge2, "_prefilter_pruned", 0) > 0, (
        "tight prefilter pruned nothing — knob inert")
    # pruning may drop walk edges but never a keyframe's backbone:
    # every consecutive-keyframe odometry edge must survive
    ids = [kf.id for kf in ge2.keyframes]
    present = set(edges_tight)
    for a, b in zip(ids, ids[1:]):
        assert (a, b) in present or (b, a) in present
