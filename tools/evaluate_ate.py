#!/usr/bin/env python3
"""TUM RGB-D absolute trajectory error (ATE) evaluation.

The reference's README protocol uses the TUM benchmark suite; RPE is
vendored there, ATE is its sibling (not vendored — provided here for a
complete evaluation story). Associates the two trajectories by nearest
timestamp, aligns them with the closed-form Horn/Umeyama similarity
(rotation + translation, no scale), reports translational error stats.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from evaluate_rpe import read_trajectory  # noqa: E402  (same directory)


def associate_stamps(a, b, offset=0.0, max_difference=0.02):
    pairs = []
    bs = sorted(b)
    import bisect
    for ta in sorted(a):
        i = bisect.bisect_left(bs, ta + offset)
        for j in (i - 1, i, i + 1):
            if 0 <= j < len(bs) and abs(ta + offset - bs[j]) < max_difference:
                pairs.append((abs(ta + offset - bs[j]), ta, bs[j]))
    pairs.sort()
    used_a, used_b, out = set(), set(), []
    for _, ta, tb in pairs:
        if ta not in used_a and tb not in used_b:
            used_a.add(ta)
            used_b.add(tb)
            out.append((ta, tb))
    out.sort()
    return out


def align_horn(model, data):
    """Least-squares rigid alignment model -> data. (3,N) arrays."""
    mu_m = model.mean(axis=1, keepdims=True)
    mu_d = data.mean(axis=1, keepdims=True)
    W = (data - mu_d) @ (model - mu_m).T
    U, _, Vt = np.linalg.svd(W)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R = U @ S @ Vt
    t = mu_d - R @ mu_m
    return R, t


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("groundtruth_file")
    p.add_argument("estimated_file")
    p.add_argument("--offset", type=float, default=0.0)
    p.add_argument("--max_difference", type=float, default=0.02)
    p.add_argument("--save", default=None)
    p.add_argument("--plot", default=None)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    gt = read_trajectory(args.groundtruth_file)
    est = read_trajectory(args.estimated_file)
    matches = associate_stamps(gt, est, args.offset, args.max_difference)
    if len(matches) < 2:
        print("error: fewer than 2 associated poses", file=sys.stderr)
        return 1

    xyz_gt = np.array([gt[ta][:3, 3] for ta, _ in matches]).T
    xyz_est = np.array([est[tb][:3, 3] for _, tb in matches]).T
    R, t = align_horn(xyz_est, xyz_gt)
    aligned = R @ xyz_est + t
    err = np.linalg.norm(aligned - xyz_gt, axis=0)

    if args.save:
        with open(args.save, "w") as f:
            for (ta, _), e in zip(matches, err):
                f.write(f"{ta:f} {e:f}\n")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.plot(xyz_gt[0], xyz_gt[2], "-", color="black", label="ground truth")
        ax.plot(aligned[0], aligned[2], "-", color="blue", label="estimated")
        ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        fig.savefig(args.plot, dpi=300)

    if args.verbose:
        print(f"compared_pose_pairs {len(err)} pairs")
        print(f"absolute_translational_error.rmse {np.sqrt(np.mean(err**2)):f} m")
        print(f"absolute_translational_error.mean {np.mean(err):f} m")
        print(f"absolute_translational_error.median {np.median(err):f} m")
        print(f"absolute_translational_error.std {np.std(err):f} m")
        print(f"absolute_translational_error.min {np.min(err):f} m")
        print(f"absolute_translational_error.max {np.max(err):f} m")
    else:
        print(f"{np.sqrt(np.mean(err**2)):f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
