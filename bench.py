"""Headline benchmark: plane-SLAM frontend throughput on one chip.

Measures steady-state frames/sec of the full per-frame frontend
(backproject -> z-filter -> decimate -> plane RANSAC -> plane coverage
images -> keypoints -> descriptors -> multiPnP against the previous
frame) on TUM-fr1-shaped
640x480 RGB-D input — the reference's hot loop (SURVEY.md §3.1), which
it could not run in real time ("computational cost is too high to meet
real-time requirements", reference README:15).

Baseline: the BASELINE.md north star of 30 FPS real-time frontend.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env overrides: BENCH_FRAMES (timed steps), BENCH_DETECTOR, BENCH_MAXKP,
BENCH_HYPOTHESES, BENCH_MODE=planes|imageonly (GraphicEnd vs GraphicEnd2
pipeline).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# v5e peak dense bf16 matmul throughput (the MXU roofline anchor)
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BPS = 819e9


def flops_model(h, w, detector, max_kp, hypotheses, n_planes,
                desc_dim=128, plane_points=8192, detect_scope="frame"):
    """Analytic per-frame FLOPs of the dominant frontend stages — a
    lower bound of useful work for the MFU estimate (elementwise
    bookkeeping and layout ops excluded).

    SLAM frontends are latency/bandwidth-bound, not matmul-bound; the
    MFU number exists to anchor the FPS claim on the roofline, not to
    look good.
    """
    px = h * w
    f = 0.0
    f += px * 12                                  # backproject + z-filter
    f += n_planes * 8 * hypotheses * plane_points  # RANSAC score matmuls
    f += px * n_planes * 8                        # membership images
    det_mult = 1 if detect_scope == "frame" else n_planes
    if detector.upper() == "SIFT":
        f += det_mult * 134 * 2 * px * 1.33       # DoG pyramid convs
        f += det_mult * px * 60                   # extrema + refine
    else:
        f += det_mult * px * 60                   # response stencils
    f += det_mult * max_kp * 3.0e5                # SIFT descriptor chain
    f += n_planes * max_kp * max_kp * desc_dim * 2  # NN match matmuls
    f += (n_planes + 2) * hypotheses * max_kp * 60  # PnP reproject scores
    return f


def enable_compile_cache(jax):
    """Persistent compile cache keyed on the exact platform build, now
    repo-local and pre-seeded (utils/compile_cache.py): a fresh checkout
    on the same platform build starts warm. Opt out with
    BENCH_NO_CACHE=1 / SLAM3D_NO_CACHE=1."""
    from slam3d_gx_tpu.utils import compile_cache

    path = compile_cache.enable(jax)
    log(f"compile cache: {path}")


def main() -> int:
    import jax
    import jax.numpy as jnp

    enable_compile_cache(jax)

    from slam3d_gx_tpu.config import CameraIntrinsics
    from slam3d_gx_tpu.frontend import pipeline
    from slam3d_gx_tpu.ops import pointcloud
    from slam3d_gx_tpu.testing import synthetic

    h, w = 480, 640
    intr = CameraIntrinsics(fx=517.0, fy=517.0, cx=318.6, cy=255.3,
                            factor=5000.0)

    n_timed = int(os.environ.get("BENCH_FRAMES", "192"))
    detector = os.environ.get("BENCH_DETECTOR", "GFTT")
    max_kp = int(os.environ.get("BENCH_MAXKP", "512"))
    hypotheses = int(os.environ.get("BENCH_HYPOTHESES", "256"))
    mode = os.environ.get("BENCH_MODE", "planes")
    baseline_fps = 30.0

    log(f"bench: {mode} {detector}/SIFT max_kp={max_kp} hyp={hypotheses} "
        f"{w}x{h} on {jax.devices()[0].platform}")

    # --- data: a short synthetic orbit, rendered once on host ------------
    scene = synthetic.RoomScene(seed=0)
    n_src = 8
    traj = synthetic.orbit_trajectory(n_src, radius=0.15, yaw_amp=0.08)
    grays, depths = [], []
    rng = np.random.default_rng(7)
    for T in traj:
        g, d = synthetic.render_frame(scene, T, intr, h, w)
        g = np.clip(g.astype(np.float64) + rng.normal(0, 2.0, g.shape),
                    0, 255).astype(np.uint8)
        grays.append(jnp.asarray(g))
        depths.append(jnp.asarray(d.astype(np.uint16)))

    # --- jitted per-frame step -------------------------------------------
    from slam3d_gx_tpu.frontend.state import empty_frame

    if mode == "streaming":
        # chunked on-device tracking (frontend/streaming.py): N frames
        # per host round-trip. Measures the streaming step rate — the
        # compute path of run_SLAM_streaming minus file IO.
        from slam3d_gx_tpu.frontend.streaming import build_tracker

        chunk = int(os.environ.get("BENCH_CHUNK", "8"))
        extract_img = pipeline.build_image_extractor(
            detector, "SIFT", intr, max_kp=max_kp)
        multipnp = pipeline.build_multipnp_image(intr, hypotheses=hypotheses)
        tracker = build_tracker(
            lambda g, d, k: extract_img(g, d), multipnp,
            max_pos_change=0.25, chunk=chunk)

        from slam3d_gx_tpu.frontend.state import empty_frame

        g_chunks = [jnp.stack([grays[(c * chunk + i) % n_src]
                               for i in range(chunk)])
                    for c in range(4)]
        d_chunks = [jnp.stack([depths[(c * chunk + i) % n_src]
                               for i in range(chunk)])
                    for c in range(4)]
        kf_feat = empty_frame(1, max_kp, 128)
        kf_pos = jnp.eye(4, dtype=jnp.float32)
        robot = jnp.eye(4, dtype=jnp.float32)
        lost = jnp.int32(0)
        key = jax.random.PRNGKey(0)

        def run_chunk(carry, c, key):
            keys = jax.random.split(key, chunk)
            carry, feats, recs = tracker(
                *carry, g_chunks[c % 4], d_chunks[c % 4], keys)
            return carry, np.asarray(recs)  # the per-chunk readback

        carry = (kf_feat, kf_pos, robot, lost, kf_feat)
        t0 = time.time()
        carry, recs = run_chunk(carry, 0, key)
        log(f"compile+first chunk: {time.time() - t0:.1f}s")

        n_chunks = max(1, n_timed // chunk)
        t0 = time.time()
        for c in range(n_chunks):
            key, sub = jax.random.split(key)
            carry, recs = run_chunk(carry, c, sub)
        dt = time.time() - t0
        fps = n_chunks * chunk / dt
        log(f"{n_chunks * chunk} frames in {dt:.2f}s -> {fps:.2f} FPS "
            f"(streaming, chunk={chunk}, 1 readback/chunk)")
        print(json.dumps({
            "metric": "streaming_frontend_fps_640x480",
            "value": round(fps, 3),
            "unit": "frames/sec",
            "vs_baseline": round(fps / baseline_fps, 3),
            "detector": detector,
            "chunk": chunk,
        }))
        return 0

    if mode == "imageonly":
        extract_img = pipeline.build_image_extractor(
            detector, "SIFT", intr, max_kp=max_kp)
        multipnp = pipeline.build_multipnp_image(intr, hypotheses=hypotheses)
        n_planes = 1

        @jax.jit
        def frame_step(prev_feat, gray, depth, key):
            feat = extract_img(gray, depth)
            res = multipnp(prev_feat, feat, key, jnp.int32(12))
            return feat, res.T, res.norm, res.inliers
    else:
        extract = pipeline.build_plane_extractor(
            detector, "SIFT", intr, max_planes=3, max_kp=max_kp,
            hypotheses=hypotheses)
        multipnp = pipeline.build_multipnp_planes(intr, hypotheses=hypotheses)
        n_planes = 3

        @jax.jit
        def frame_step(prev_feat, gray, depth, key):
            xyz, valid = pointcloud.backproject(
                depth, intr.fx, intr.fy, intr.cx, intr.cy, intr.factor)
            xyz = xyz.reshape(-1, 3)
            valid = pointcloud.passthrough_z(xyz, valid.reshape(-1), 0.0, 7.0)
            k1, k2 = jax.random.split(key)
            feat = extract(gray.astype(jnp.float32),
                           depth.astype(jnp.float32), xyz, valid, k1)
            res = multipnp(prev_feat, feat, k2, jnp.int32(12))
            return feat, res.T, res.norm, res.inliers

    # --- warmup (compile + first iterations) ------------------------------
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_timed + 4)

    t0 = time.time()
    feat = frame_step(empty_frame(n_planes, max_kp, 128),
                      grays[0], depths[0], keys[1])[0]
    jax.block_until_ready(feat)
    first_step_s = time.time() - t0
    log(f"compile+first step: {first_step_s:.1f}s")
    for i in range(3):
        feat, *_ = frame_step(feat, grays[(i + 1) % n_src],
                              depths[(i + 1) % n_src], keys[2 + i])
    np.asarray(feat.coeffs)  # real sync (see note below)

    # --- timed steady-state loop ------------------------------------------
    t0 = time.time()
    out = []
    for i in range(n_timed):
        j = i % n_src
        feat, T, norm, inl = frame_step(feat, grays[j], depths[j], keys[4 + i])
        out.append((T, norm, inl))
    # NB: force a real host transfer — through remote-relay device
    # plugins block_until_ready can return before execution finishes;
    # np.asarray of a value data-dependent on every frame cannot
    np.asarray(out[-1][0])
    dt = time.time() - t0
    fps = n_timed / dt

    inliers = [int(o[2]) for o in out[:8]]
    log(f"{n_timed} frames in {dt:.2f}s -> {fps:.2f} FPS; "
        f"sample inlier counts {inliers}")

    gflops = flops_model(h, w, detector, max_kp, hypotheses, n_planes) / 1e9
    mfu = gflops * 1e9 * fps / PEAK_FLOPS_BF16
    log(f"flops model: {gflops:.2f} GFLOP/frame -> "
        f"{gflops * fps:.0f} GFLOP/s, MFU {mfu * 100:.3f}% "
        f"(latency-bound workload; roofline anchor, not a target)")

    print(json.dumps({
        "metric": "frontend_fps_640x480",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 3),
        "detector": detector,
        "model_gflops_per_frame": round(gflops, 3),
        "mfu": round(mfu, 6),
        "first_step_s": round(first_step_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
