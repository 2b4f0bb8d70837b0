#!/usr/bin/env python3
"""Batched-registration THROUGHPUT benchmark (MXU-utilization mode).

The reference's experiment program is a batch workload: exp1_2.py:19-27
registers 100 anchors x 19 offsets = 1900 independent pairs, one
process per pair. The per-frame SLAM step is latency-bound (MFU ~0.06%,
RESULTS.md roofline note) because one frame simply has too few FLOPs to
fill the MXU; this phase attests the OTHER side of the frontier — the
DP layer (parallel/registration.BatchedRegistrar) running the same
exp1_2 protocol as large fixed-shape device batches, where utilization
is a design target:

- frames are extracted ONCE in one vmapped device program (batched
  frame extraction), then
- B pairs are registered as chunked vmapped multiPnP launches that are
  all dispatched before the single sync (the relay executes enqueued
  programs back-to-back, so the pipeline hides every host gap), with
- a larger hypothesis batch than the latency phase (512 vs 256):
  when the MXU is idle, extra RANSAC hypotheses are free accuracy.

Reports pairs/s (median over passes), the analytic model GFLOP/s and
MFU, batched-extraction FPS, and the sweep's median translation error
vs ground truth so throughput cannot be bought with accuracy.

Usage: sweep_throughput.py [pairs]
Env: SWEEP_PAIRS (384), SWEEP_BATCH (chunk size, 128), SWEEP_MAXKP
     (512), SWEEP_HYP (512), SWEEP_FRAMES (16), SWEEP_DETECTOR (GFTT),
     SWEEP_DESCRIPTOR (SIFT), SWEEP_PASSES (3), SWEEP_PLATFORM
     (cpu forces the CPU backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

if os.environ.get("SWEEP_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SWEEP_PLATFORM"])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def register_flops(K: int, hyp: int, P: int, D: int = 128) -> float:
    """Analytic FLOPs of ONE multiPnP registration (the batched path's
    per-pair useful work; elementwise bookkeeping excluded) — the same
    stage model as bench.flops_model's match/PnP terms:

    - P per-plane NN-match distance matmuls, (K,D)x(D,K) each;
    - P per-plane RANSAC hypothesis scores (hyp reprojections of K pts);
    - pooled RANSAC + 3px refine over the pooled P*K set, hyp each.
    """
    f = P * 2.0 * K * K * D                 # match distance matmuls
    f += P * hyp * K * 60.0                 # per-plane reproject scores
    f += 2.0 * hyp * (P * K) * 60.0         # pooled + refine scores
    f += (P + 2.0) * hyp * 1200.0           # P3P solves + polish
    return f


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    n_pairs = int(argv[0]) if argv else int(
        os.environ.get("SWEEP_PAIRS", "384"))
    batch = int(os.environ.get("SWEEP_BATCH", "128"))
    max_kp = int(os.environ.get("SWEEP_MAXKP", "512"))
    hyp = int(os.environ.get("SWEEP_HYP", "512"))
    n_frames = int(os.environ.get("SWEEP_FRAMES", "16"))
    detector = os.environ.get("SWEEP_DETECTOR", "GFTT")
    descriptor = os.environ.get("SWEEP_DESCRIPTOR", "SIFT")
    n_passes = int(os.environ.get("SWEEP_PASSES", "3"))

    import jax
    import jax.numpy as jnp

    from slam3d_gx_tpu.utils import compile_cache

    log(f"compile cache: {compile_cache.enable(jax)}")

    import bench
    from slam3d_gx_tpu.config import CameraIntrinsics
    from slam3d_gx_tpu.frontend import pipeline
    from slam3d_gx_tpu.frontend.state import FrameFeatures
    from slam3d_gx_tpu.geometry import se3
    from slam3d_gx_tpu.ops import pointcloud
    from slam3d_gx_tpu.parallel import registration
    from slam3d_gx_tpu.testing import synthetic

    h, w = 480, 640
    intr = CameraIntrinsics(fx=517.0, fy=517.0, cx=318.6, cy=255.3,
                            factor=5000.0)
    n_planes = 3
    log(f"sweep: {n_pairs} pairs, chunk {batch}, {detector}/{descriptor} "
        f"max_kp={max_kp} hyp={hyp}, {n_frames} frames {w}x{h} "
        f"on {jax.devices()[0].platform}")

    # --- data ---------------------------------------------------------------
    scene = synthetic.RoomScene(seed=3)
    traj = synthetic.orbit_trajectory(n_frames, radius=0.25, yaw_amp=0.12)
    rng = np.random.default_rng(7)
    grays, depths = [], []
    for T in traj:
        g, d = synthetic.render_frame(scene, T, intr, h, w)
        g = np.clip(g.astype(np.float64) + rng.normal(0, 2.0, g.shape),
                    0, 255).astype(np.uint8)
        grays.append(g)
        depths.append(d.astype(np.uint16))
    grays_d = jnp.asarray(np.stack(grays))
    depths_d = jnp.asarray(np.stack(depths))

    # --- batched frame extraction (ONE vmapped program for all frames) ------
    extract = pipeline.build_plane_extractor(
        detector, descriptor, intr, max_planes=n_planes, max_kp=max_kp,
        hypotheses=hyp)

    def one(gray, depth, key):
        xyz, valid = pointcloud.backproject(
            depth, intr.fx, intr.fy, intr.cx, intr.cy, intr.factor)
        xyz = xyz.reshape(-1, 3)
        valid = pointcloud.passthrough_z(xyz, valid.reshape(-1), 0.0, 7.0)
        return extract(gray.astype(jnp.float32), depth.astype(jnp.float32),
                       xyz, valid, key)

    batch_extract = jax.jit(jax.vmap(one))
    key = jax.random.PRNGKey(0)
    ekeys = jax.random.split(key, n_frames)

    # --- exp1_2-protocol pairs (anchors x offsets within the frame set) ----
    import random as _random
    prng = _random.Random(0)
    pairs = []
    while len(pairs) < n_pairs:
        a = prng.randrange(0, n_frames - 1)
        off = prng.randrange(1, min(8, n_frames - a))
        pairs.append((a, a + off))
    idx_a = jnp.asarray([p[0] for p in pairs], jnp.int32)
    idx_b = jnp.asarray([p[1] for p in pairs], jnp.int32)

    reg = registration.BatchedRegistrar(
        intr, image_only=False, error_threshold=1e9, hypotheses=hyp)

    gather = jax.jit(lambda f, i: jax.tree.map(lambda x: x[i], f))

    # --- warm both big programs concurrently (relay compiles them in
    # parallel, wall ~= slowest compile — streaming_wall's trick) -----------
    import concurrent.futures as cf

    def warm_extract():
        t0 = time.time()
        f = batch_extract(grays_d, depths_d, ekeys)
        jax.block_until_ready(f.desc)
        np.asarray(f.plane_valid)  # true relay sync
        return "batch-extract", time.time() - t0

    def warm_register():
        t0 = time.time()
        f0 = jax.tree.map(
            lambda s: jnp.zeros((batch,) + s.shape,
                                s.dtype) if hasattr(s, "shape") else s,
            FrameFeatures(
                coeffs=jnp.zeros((n_planes, 4), jnp.float32),
                plane_valid=jnp.zeros((n_planes,), bool),
                uv=jnp.zeros((n_planes, max_kp, 2), jnp.float32),
                kp3d=jnp.zeros((n_planes, max_kp, 3), jnp.float32),
                desc=jnp.zeros((n_planes, max_kp, 128), jnp.float32),
                kp_valid=jnp.zeros((n_planes, max_kp), bool)))
        keys = jax.random.split(jax.random.PRNGKey(1), batch)
        res = reg.fn(f0, f0, keys, jnp.int32(0))
        np.asarray(res.norm)
        return "batch-register", time.time() - t0

    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=2) as ex:
        for name, dt in ex.map(lambda f: f(), [warm_extract, warm_register]):
            log(f"warm {name}: {dt:.1f}s")
    first_step_s = time.time() - t0
    log(f"parallel warm total {first_step_s:.1f}s")

    # --- timed batched extraction -------------------------------------------
    t0 = time.time()
    feats = batch_extract(grays_d, depths_d, ekeys)
    np.asarray(feats.plane_valid)
    extract_dt = time.time() - t0
    extract_fps = n_frames / extract_dt
    log(f"batched extraction: {n_frames} frames in {extract_dt:.2f}s "
        f"-> {extract_fps:.1f} FPS")

    # --- timed registration passes (dispatch all chunks, sync once) --------
    from slam3d_gx_tpu.frontend.state import pack_result

    n_chunks = (n_pairs + batch - 1) // batch
    chunk_idx = []
    for c in range(n_chunks):
        sl = slice(c * batch, min((c + 1) * batch, n_pairs))
        ia = jnp.pad(idx_a[sl], (0, batch - (sl.stop - sl.start)))
        ib = jnp.pad(idx_b[sl], (0, batch - (sl.stop - sl.start)))
        chunk_idx.append((ia, ib, sl.stop - sl.start))

    # untimed pipeline warm: the chunk gather + pack programs compile on
    # their first use; one chunk through the full dispatch path keeps
    # that out of pass 0's rate
    _ia, _ib, _nv = chunk_idx[0]
    _keys = jax.random.split(jax.random.PRNGKey(9), batch)
    registration.resolve_async(
        [(pack_result(reg.fn(gather(feats, _ia), gather(feats, _ib),
                             _keys, jnp.int32(0))), _nv)])

    pass_rates, last_results = [], None
    for p_i in range(n_passes):
        kk = jax.random.split(jax.random.PRNGKey(10 + p_i), n_chunks)
        t0 = time.time()
        pending = []
        for c, (ia, ib, nv) in enumerate(chunk_idx):
            fa = gather(feats, ia)
            fb = gather(feats, ib)
            keys = jax.random.split(kk[c], batch)
            res = reg.fn(fa, fb, keys, jnp.int32(0))
            pending.append((pack_result(res), nv))
        results = registration.resolve_async(pending)  # syncs every chunk
        dt = time.time() - t0
        pass_rates.append(n_pairs / dt)
        last_results = results
        log(f"pass {p_i}: {n_pairs} pairs in {dt:.2f}s "
            f"-> {pass_rates[-1]:.0f} pairs/s")

    pairs_per_s = float(np.median(pass_rates))
    spread = (round((max(pass_rates) - min(pass_rates)) / pairs_per_s, 3)
              if len(pass_rates) > 1 else 0.0)

    # --- accuracy (throughput must not cost accuracy) ------------------------
    errs = []
    for (a, b), (T, norm, inl, ok) in zip(pairs, last_results):
        Tr = se3.inverse(traj[a]) @ traj[b]
        Terr = se3.inverse(Tr) @ se3.inverse(T)
        errs.append(float(np.linalg.norm(Terr[:3, 3])))
    errs = np.array(errs)
    med_err = float(np.median(errs))
    fail = float((errs > 0.25).mean())
    log(f"accuracy: median err_t {med_err:.4f} m, fail>0.25m {fail*100:.1f}%")

    # --- roofline ------------------------------------------------------------
    reg_gflop = register_flops(max_kp, hyp, n_planes) / 1e9
    gflops_s = reg_gflop * pairs_per_s
    mfu = gflops_s * 1e9 / bench.PEAK_FLOPS_BF16
    ext_gflop = bench.flops_model(h, w, detector, max_kp, hyp, n_planes) / 1e9
    log(f"model: {reg_gflop:.2f} GFLOP/pair -> {gflops_s:.0f} GFLOP/s, "
        f"MFU {mfu * 100:.3f}% (extract model {ext_gflop:.2f} GFLOP/frame)")

    print(json.dumps({
        "metric": "sweep_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "pairs/sec",
        "mfu": round(mfu, 6),
        "model_gflops_per_pair": round(reg_gflop, 3),
        "model_gflops_per_s": round(gflops_s, 1),
        "pairs": n_pairs,
        "batch": batch,
        "hypotheses": hyp,
        "max_kp": max_kp,
        "detector": detector,
        "passes": [round(r, 1) for r in pass_rates],
        "pass_spread": spread,
        "extract_fps": round(extract_fps, 2),
        "median_err_t": round(med_err, 4),
        "fail_rate": round(fail, 4),
        "first_step_s": round(first_step_s, 1),
        "platform": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
