#!/usr/bin/env python3
"""Summarize data/exp1/error.log from the exp1_2 sweeps.

Rows: `f1 f2 gt_trans gt_rot err_trans err_rot inliers`
(reference src/exp1/exp1_2.cpp:292-295). Prints per-offset medians and
overall stats — the analysis the reference repo did offline from the
same log.

Usage: exp1_stats.py [data/exp1/error.log]
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "data/exp1/error.log"
    rows = []
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) >= 7:
                try:
                    rows.append([float(x) for x in v[:7]])
                except ValueError:
                    continue
    if not rows:
        print("no rows", file=sys.stderr)
        return 1
    a = np.array(rows)
    off = (a[:, 1] - a[:, 0]).astype(int)
    err_t, err_r, inl = a[:, 4], a[:, 5], a[:, 6]

    print(f"{'offset':>6} {'n':>5} {'med_err_t[m]':>13} {'med_err_r[rad]':>15} "
          f"{'med_inliers':>12} {'fail%':>6}")
    for o in sorted(set(off)):
        m = off == o
        fail = np.mean(err_t[m] > 0.5) * 100
        print(f"{o:>6} {m.sum():>5} {np.median(err_t[m]):>13.4f} "
              f"{np.median(err_r[m]):>15.4f} {np.median(inl[m]):>12.0f} "
              f"{fail:>5.1f}%")
    print(f"\noverall: n={len(a)} med_err_t={np.median(err_t):.4f} m  "
          f"med_err_r={np.median(err_r):.4f} rad  "
          f"p90_err_t={np.percentile(err_t, 90):.4f} m  "
          f"fail(>0.5m)={np.mean(err_t > 0.5) * 100:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
