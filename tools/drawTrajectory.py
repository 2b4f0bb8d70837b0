#!/usr/bin/env python3
"""Plot trajectory.txt (x/z top view) against odometry.txt -> pdf.

Parity target: reference tools/drawTrajectory.py:7-27 (plots the
x and z columns of trajectory.txt and odometry.txt into traj.pdf).

Usage: drawTrajectory.py [trajectory.txt] [odometry.txt] [out.pdf]
"""

from __future__ import annotations

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def load_xz(path: str):
    xs, zs = [], []
    with open(path) as f:
        for line in f:
            vals = line.split()
            if len(vals) < 4:
                continue
            try:
                xs.append(float(vals[1]))
                zs.append(float(vals[3]))
            except ValueError:
                continue
    return np.array(xs), np.array(zs)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    traj_path = argv[0] if len(argv) > 0 else "trajectory.txt"
    odo_path = argv[1] if len(argv) > 1 else "odometry.txt"
    out = argv[2] if len(argv) > 2 else "traj.pdf"

    fig, ax = plt.subplots()
    x, z = load_xz(traj_path)
    ax.plot(x, z, "-", color="blue", label="trajectory")
    if os.path.exists(odo_path):
        xo, zo = load_xz(odo_path)
        ax.plot(xo, zo, "-", color="red", label="odometry")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    fig.savefig(out)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
