"""saveOutput keyframe.txt final.g2o [pass_z]: global map fusion.

Parity target: reference src/saveOutput.cpp:18-98 — per keyframe row
(id, frame): load pcd/frame.pcd, voxel-grid filter, z passthrough
(0..pass_z, default 5.0), transform by the optimized vertex estimate,
accumulate; final voxel filter -> result.pcd (ASCII, savePCDFile default).

TPU-native: voxel filter + transform run as jitted kernels per frame
(bucket-padded), accumulation on host.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax.numpy as jnp

from ..backend import PoseGraphOptimizer
from ..config import ParameterReader
from ..io import pcd as pcd_io, tum
from ..ops import pointcloud


def _bucket(n: int, base: int = 1024) -> int:
    c = base
    while c < n:
        c *= 2
    return c


def fuse_map(
    keyframe_path: str,
    g2o_path: str,
    pass_z: float = 5.0,
    params: ParameterReader | None = None,
    out_path: str = "result.pcd",
) -> int:
    params = params or ParameterReader("./parameters.yaml")
    grid_leaf = params.get_float("grid_leaf")
    _, _, pcl_path = tum.dataset_paths(params.GetPara("data_source"))

    opt = PoseGraphOptimizer()
    opt.load(g2o_path)

    out_xyz = []
    out_rgb = []
    for kid, frame in tum.read_keyframes(keyframe_path):
        if kid not in opt.graph.vertices:
            print(f"cannot find vertex: {kid}")
            continue
        path = os.path.join(pcl_path, f"{frame}.pcd")
        print(f"loading {path}")
        xyz, rgba = pcd_io.read_pcd(path)
        r, g, b = pcd_io.unpack_rgba(rgba)
        rgb = np.stack([r, g, b], -1).astype(np.float32)
        n = xyz.shape[0]
        cap = _bucket(n)
        xyz_p = np.zeros((cap, 3), np.float32)
        xyz_p[:n] = xyz
        rgb_p = np.zeros((cap, 3), np.float32)
        rgb_p[:n] = rgb
        mask = np.zeros(cap, bool)
        mask[:n] = True

        vx, vc, vm = pointcloud.voxel_downsample(
            jnp.asarray(xyz_p), jnp.asarray(rgb_p), jnp.asarray(mask), grid_leaf
        )
        vm = pointcloud.passthrough_z(vx, vm, 0.0, pass_z)
        pos = opt.vertex_estimate(kid)
        vx = pointcloud.transform_points(jnp.asarray(pos, dtype=jnp.float32), vx)
        xyz_h, rgb_h = pointcloud.compact(vx, vm, vc)
        out_xyz.append(xyz_h)
        out_rgb.append(rgb_h)

    if not out_xyz:
        print("no keyframes fused")
        return -1
    all_xyz = np.concatenate(out_xyz)
    all_rgb = np.concatenate(out_rgb)
    # final voxel filter over the fused map
    cap = _bucket(all_xyz.shape[0])
    xyz_p = np.zeros((cap, 3), np.float32)
    xyz_p[: len(all_xyz)] = all_xyz
    rgb_p = np.zeros((cap, 3), np.float32)
    rgb_p[: len(all_rgb)] = all_rgb
    mask = np.zeros(cap, bool)
    mask[: len(all_xyz)] = True
    vx, vc, vm = pointcloud.voxel_downsample(
        jnp.asarray(xyz_p), jnp.asarray(rgb_p), jnp.asarray(mask), grid_leaf
    )
    xyz_h, rgb_h = pointcloud.compact(vx, vm, vc)
    rgb_u8 = np.clip(np.round(rgb_h), 0, 255).astype(np.uint8)
    rgba = pcd_io.pack_rgba(rgb_u8[:, 0], rgb_u8[:, 1], rgb_u8[:, 2])
    pcd_io.write_pcd(out_path, xyz_h, rgba, binary=False)
    print("final result saved.")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print("saveOutput keyframe.txt final.g2o [ pass_z ]")
        return -1
    pass_z = float(argv[2]) if len(argv) >= 3 else 5.0
    return fuse_map(argv[0], argv[1], pass_z)


if __name__ == "__main__":
    raise SystemExit(main())
