#!/usr/bin/env python3
"""TUM RGB-D relative pose error (RPE) evaluation.

Same CLI surface and semantics as the TUM benchmark script the reference
vendors (reference tools/evaluate_rpe.py, driven per README:43-47):
reads two TUM-format trajectories (`timestamp tx ty tz qx qy qz qw`),
samples pose pairs at a fixed delta (or all pairs), and reports
translational / rotational relative errors. First-party implementation.
"""

from __future__ import annotations

import argparse
import random
import sys

import numpy as np

_EPS = np.finfo(float).eps * 4.0


def read_trajectory(path: str, matrix: bool = True):
    """Returns dict timestamp -> 4x4 pose (or 7-list)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.replace(",", " ").strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            if len(vals) < 8:
                continue
            try:
                nums = [float(v) for v in vals[:8]]
            except ValueError:
                continue
            ts, data = nums[0], nums[1:8]
            out[ts] = transform44(data) if matrix else data
    if not out:
        raise ValueError(f"no valid poses in {path}")
    return out


def transform44(d):
    """[tx ty tz qx qy qz qw] -> 4x4 homogeneous matrix."""
    t = np.array(d[0:3], dtype=np.float64)
    q = np.array(d[3:7], dtype=np.float64)
    nq = float(np.dot(q, q))
    T = np.eye(4)
    T[:3, 3] = t
    if nq < _EPS:
        return T
    q = q * np.sqrt(2.0 / nq)
    q = np.outer(q, q)
    T[:3, :3] = np.array([
        [1.0 - q[1, 1] - q[2, 2], q[0, 1] - q[2, 3], q[0, 2] + q[1, 3]],
        [q[0, 1] + q[2, 3], 1.0 - q[0, 0] - q[2, 2], q[1, 2] - q[0, 3]],
        [q[0, 2] - q[1, 3], q[1, 2] + q[0, 3], 1.0 - q[0, 0] - q[1, 1]],
    ])
    return T


def ominus(a, b):
    """Relative transform a^-1 b."""
    return np.linalg.inv(a) @ b


def scale(a, scalar):
    """Scale the translational component of a 4x4 matrix (TUM
    `scale`): applied to the estimated relative motion BEFORE the error
    composition, not to the final error norm."""
    out = np.array(a, dtype=np.float64, copy=True)
    out[:3, 3] *= scalar
    return out


def find_closest_index(L, t):
    """Index of the closest value in sorted list L (TUM binary search,
    reference tools/evaluate_rpe.py:110-135 — kept algorithmically
    identical so tie-breaking matches)."""
    beginning = 0
    difference = abs(L[0] - t)
    best = 0
    end = len(L)
    while beginning < end:
        middle = int((end + beginning) / 2)
        if abs(L[middle] - t) < difference:
            difference = abs(L[middle] - t)
            best = middle
        if t == L[middle]:
            return middle
        elif L[middle] > t:
            end = middle
        else:
            beginning = middle + 1
    return best


def compute_distance(T):
    return float(np.linalg.norm(T[:3, 3]))


def compute_angle(T):
    return float(np.arccos(np.clip((np.trace(T[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)))


def distances_along_trajectory(traj):
    keys = sorted(traj.keys())
    motion = [ominus(traj[keys[i]], traj[keys[i + 1]]) for i in range(len(keys) - 1)]
    dist = [0.0]
    for t in motion:
        dist.append(dist[-1] + compute_distance(t))
    return dist


def rotations_along_trajectory(traj, scale):
    keys = sorted(traj.keys())
    motion = [ominus(traj[keys[i]], traj[keys[i + 1]]) for i in range(len(keys) - 1)]
    dist = [0.0]
    for t in motion:
        dist.append(dist[-1] + compute_angle(t) * scale)
    return dist


def evaluate_trajectory(traj_gt, traj_est, param_max_pairs=10000,
                        param_fixed_delta=False, param_delta=1.0,
                        param_delta_unit="s", param_offset=0.0,
                        param_scale=1.0):
    """Pairs of poses (delta apart), per-pair (ts, ts, trans_err, rot_err).

    Mirrors the TUM protocol: delta in seconds ('s'), frames ('f'),
    meters ('m'), or radians ('rad').
    """
    stamps_gt = sorted(traj_gt.keys())
    stamps_est = sorted(traj_est.keys())
    stamps_est_ret = [
        t_est for t_est in stamps_est
        if min(abs(t_est + param_offset - t_gt) for t_gt in stamps_gt) < 0.2
    ]
    if not stamps_est_ret:
        raise ValueError("no overlapping timestamps between trajectories")

    if param_delta_unit == "s":
        index_est = stamps_est
    elif param_delta_unit == "f":
        index_est = list(range(len(stamps_est)))
    elif param_delta_unit == "m":
        index_est = distances_along_trajectory(traj_est)
    elif param_delta_unit == "rad":
        index_est = rotations_along_trajectory(traj_est, 1.0)
    elif param_delta_unit == "deg":
        index_est = rotations_along_trajectory(traj_est, 180.0 / np.pi)
    else:
        raise ValueError(f"unknown delta unit {param_delta_unit}")

    if not param_fixed_delta:
        if param_max_pairs == 0 or len(stamps_est) < np.sqrt(param_max_pairs):
            pairs = [(i, j) for i in range(len(stamps_est))
                     for j in range(len(stamps_est))]
        else:
            # randint (not randrange) so a seeded RNG draws the exact
            # same pair sequence as the TUM script
            pairs = [(random.randint(0, len(stamps_est) - 1),
                      random.randint(0, len(stamps_est) - 1))
                     for _ in range(param_max_pairs)]
    else:
        # TUM semantics: closest index (not first >=), and pairs whose
        # partner is the final pose are dropped (the reference's
        # `j != len(traj_est)-1` gate, tools/evaluate_rpe.py:262-266)
        pairs = []
        for i in range(len(index_est)):
            j = find_closest_index(index_est, index_est[i] + param_delta)
            if j != len(stamps_est) - 1:
                pairs.append((i, j))
        if param_max_pairs and len(pairs) > param_max_pairs:
            pairs = random.sample(pairs, param_max_pairs)

    # gt association gate: twice the median ground-truth frame interval
    # (NOT a fixed constant — sparse ground truth widens the gate)
    gt_interval = float(np.median(np.diff(stamps_gt))) if len(stamps_gt) > 1 else 0.1
    gt_max_time_difference = 2.0 * gt_interval

    def nearest_gt(ts):
        return stamps_gt[find_closest_index(stamps_gt, ts + param_offset)]

    result = []
    for i, j in pairs:
        ts_a, ts_b = stamps_est[i], stamps_est[j]
        ga, gb = nearest_gt(ts_a), nearest_gt(ts_b)
        if (abs(ga - (ts_a + param_offset)) > gt_max_time_difference
                or abs(gb - (ts_b + param_offset)) > gt_max_time_difference):
            continue
        E = ominus(
            scale(ominus(traj_est[ts_b], traj_est[ts_a]), param_scale),
            ominus(traj_gt[gb], traj_gt[ga]),
        )
        # TUM row layout: est stamps, matched gt stamps, then errors
        result.append([ts_a, ts_b, ga, gb,
                       compute_distance(E), compute_angle(E)])
    if not result:
        raise ValueError("couldn't find matching timestamp pairs")
    return result


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("groundtruth_file")
    p.add_argument("estimated_file")
    p.add_argument("--max_pairs", type=int, default=10000)
    p.add_argument("--fixed_delta", action="store_true")
    p.add_argument("--delta", type=float, default=1.0)
    p.add_argument("--delta_unit", default="s", choices=["s", "m", "rad", "deg", "f"])
    p.add_argument("--offset", type=float, default=0.0)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--save", default=None)
    p.add_argument("--plot", default=None)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    random.seed(0)  # reproducible downsampling (reference main does too)
    traj_gt = read_trajectory(args.groundtruth_file)
    traj_est = read_trajectory(args.estimated_file)
    result = evaluate_trajectory(
        traj_gt, traj_est, args.max_pairs, args.fixed_delta,
        args.delta, args.delta_unit, args.offset, args.scale)

    trans = np.array(result)[:, 4]
    rot = np.array(result)[:, 5]

    if args.save:
        with open(args.save, "w") as f:
            f.write("\n".join(
                " ".join("%f" % v for v in line) for line in result) + "\n")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        stamps = np.array(result)[:, 0] - result[0][0]
        fig, ax = plt.subplots()
        ax.plot(stamps, trans, "-", color="blue")
        ax.set_xlabel("time [s]")
        ax.set_ylabel("translational error [m]")
        fig.savefig(args.plot, dpi=300)

    if args.verbose:
        print(f"compared_pose_pairs {len(trans)} pairs")
        print(f"translational_error.rmse {np.sqrt(np.dot(trans, trans) / len(trans)):f} m")
        print(f"translational_error.mean {np.mean(trans):f} m")
        print(f"translational_error.median {np.median(trans):f} m")
        print(f"translational_error.std {np.std(trans):f} m")
        print(f"translational_error.min {np.min(trans):f} m")
        print(f"translational_error.max {np.max(trans):f} m")
        print(f"rotational_error.rmse {np.sqrt(np.dot(rot, rot) / len(rot)) * 180.0 / np.pi:f} deg")
        print(f"rotational_error.mean {np.mean(rot) * 180.0 / np.pi:f} deg")
        print(f"rotational_error.median {np.median(rot) * 180.0 / np.pi:f} deg")
        print(f"rotational_error.std {np.std(rot) * 180.0 / np.pi:f} deg")
        print(f"rotational_error.min {np.min(rot) * 180.0 / np.pi:f} deg")
        print(f"rotational_error.max {np.max(rot) * 180.0 / np.pi:f} deg")
    else:
        # TUM protocol prints the MEAN translational error (the
        # reference main's non-verbose output) — not the RMSE
        print(np.mean(trans))
    return 0


if __name__ == "__main__":
    sys.exit(main())
