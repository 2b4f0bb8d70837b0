#!/usr/bin/env python3
"""Smoke test for evaluate_rpe's pose math (reference tools/testrpe.py:1-11)."""

import numpy as np

from evaluate_rpe import compute_angle, compute_distance, ominus, transform44

a = transform44([0, 0, 0, 0, 0, 0, 1])
b = transform44([1, 0, 0, 0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
rel = ominus(a, b)
print("relative transform:\n", rel)
print("distance:", compute_distance(rel))
print("angle:", compute_angle(rel), "(expected", np.pi / 4, ")")
assert abs(compute_distance(rel) - 1.0) < 1e-9
assert abs(compute_angle(rel) - np.pi / 4) < 1e-9
print("ok")
