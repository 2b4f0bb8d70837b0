"""Streaming frontend: N frames of visual odometry per host round-trip.

The reference's frame loop is strictly sequential and synchronous
(src/run_SLAM.cpp:30-33), and even this framework's per-frame mode must
read one pose back per frame for the keyframe decision — through a
remote relay that single sync (~30-60 ms) caps the wall rate however
fast the jitted step is. This module folds the *tracking* state machine
of GraphicEnd2::run (src/GraphicEnd2.cpp:149-201: extract -> multiPnP
-> invert -> keyframe/small-motion/lost branches) into one `lax.scan`
over a chunk of frames, carried entirely on device:

  carry = (current-keyframe features, kf_pos, robot, lost counter)
  per frame: features = extract(gray, depth)
             res = multiPnP(kf_feat, features); T = res.T^-1
             ok    -> robot' = T @ kf_pos; lost' = 0
             norm > max_pos_change -> promote: kf_feat' = features,
                                      kf_pos' = robot'
             !ok   -> lost' = lost + 1

One packed (N, 24) readback per chunk carries every decision the host
needs (measurement T, norm, inliers, ok, new-keyframe flag, lost
counter); per-frame features stay on device and new keyframes are
sliced out of the returned stack with a single jitted take. Keyframe
bookkeeping, graph edges, loop closure (async, parallel/registration)
and the logs are then replayed host-side with identical semantics.

lostRecovery cannot run on device (it mutates the pose graph and scans
history, src/GraphicEnd.cpp:764-838): when a chunk's lost counter
crosses `lost_frames`, results after the trigger frame are discarded
and those frames are re-run through the exact per-frame path.

Within-chunk results are decision-equivalent to per-frame mode; RANSAC
draws consume a different PRNG stream, so poses match statistically,
not bit-for-bit (same contract as the reference's srand run-to-run).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..io import images
from .graphic_end import GraphicEnd, GraphicEnd2


def _inv_se3(T):
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    return Ti.at[:3, 3].set(-R.T @ t)


def build_tracker(extract_fn, multipnp, max_pos_change: float,
                  chunk: int):
    """Jitted track_chunk(kf_feat, kf_pos, robot, lost, grays, depths,
    keys) -> (carry', features_stack (N,...), records (N,24)).

    extract_fn(gray_f32, depth_f32, key) -> FrameFeatures — the plane
    extractor consumes a PRNG key (RANSAC), the image extractor ignores
    it."""

    @jax.jit
    def track_chunk(kf_feat, kf_pos, robot, lost, grays, depths, keys):
        def step(carry, xs):
            kf_feat, kf_pos, robot, lost = carry
            gray, depth, key = xs
            k_ext, k_pnp = jax.random.split(key)
            # frames arrive as raw u8/u16 (half the relay upload bytes);
            # cast on device
            feat = extract_fn(gray.astype(jnp.float32),
                              depth.astype(jnp.float32), k_ext)
            res = multipnp(kf_feat, feat, k_pnp, jnp.int32(12))
            T = _inv_se3(res.T)
            ok = res.ok
            new_kf = ok & (res.norm > max_pos_change)
            robot_n = jnp.where(ok, T @ kf_pos, robot)
            kf_pos_n = jnp.where(new_kf, robot_n, kf_pos)
            kf_feat_n = jax.tree.map(
                lambda new, old: jnp.where(new_kf, new, old), feat, kf_feat)
            lost_n = jnp.where(ok, 0, lost + 1)
            rec = jnp.concatenate([
                T.reshape(16).astype(jnp.float32),
                jnp.stack([
                    res.norm.astype(jnp.float32),
                    res.inliers.astype(jnp.float32),
                    ok.astype(jnp.float32),
                    new_kf.astype(jnp.float32),
                    lost_n.astype(jnp.float32),
                ]),
                robot_n[:3, 3].astype(jnp.float32),
            ])
            return (kf_feat_n, kf_pos_n, robot_n, lost_n), (feat, rec)

        carry, (feats, recs) = jax.lax.scan(
            step, (kf_feat, kf_pos, robot, lost),
            (grays, depths, keys), length=chunk)
        return carry, feats, recs

    return track_chunk


_take = jax.jit(lambda stack, i: jax.tree.map(lambda x: x[i], stack))


class _StreamingMixin:
    """Chunked on-device tracking shared by the image-only and plane
    frontends. Use run_streaming(n_frames) instead of n run() calls.

    Subclasses provide _make_extract_fn() -> extract(gray_f32,
    depth_f32, key) and set `replay_on_fail`: True makes the first
    failed frame (and everything after it in the chunk) replay through
    the exact per-frame path — required for GraphicEnd, whose lost
    branch runs the last-frame rescue (src/GraphicEnd.cpp:183-227) that
    can promote keyframes the device scan didn't model."""

    replay_on_fail = False

    def _init_streaming(self, chunk: int):
        self.chunk = chunk
        self._tracker = None

    def _frame_files_exist(self, idx: int) -> bool:
        """Contiguous-prefix probe. The plane frontend also requires the
        frame's PCD: the chunk path never reads it (clouds come from
        on-device backprojection) but the per-frame fallback/replay
        paths do — a PNG-present/PCD-missing frame must stop the run
        cleanly here instead of crashing in read_pcd mid-replay."""
        if not os.path.exists(os.path.join(self.rgb_path, f"{idx}.png")):
            return False
        if self.replay_on_fail and not self.image_only:
            return os.path.exists(
                os.path.join(self.pcl_path, f"{idx}.pcd"))
        return True

    def _ensure_tracker(self):
        if self._tracker is None:
            self._tracker = build_tracker(
                self._make_extract_fn(), self.multipnp,
                self.max_pos_change, self.chunk)

    def _load_frames(self, indices):
        grays, depths = [], []
        for idx in indices:
            pre = None
            if getattr(self, "_prefetch", None) is not None \
                    and self._prefetch_next == idx:
                save = self.index
                self.index = idx
                pre = self._prefetch_pop()
                self.index = save
            if pre is not None:
                g, d, _ = pre
            else:
                g = images.load_gray(
                    os.path.join(self.rgb_path, f"{idx}.png"))
                d = images.load_depth(
                    os.path.join(self.dep_path, f"{idx}.png"))
            grays.append(np.asarray(g))
            depths.append(np.asarray(d, np.uint16))
        return np.stack(grays), np.stack(depths)

    def run_streaming(self, n_frames: int) -> int:
        """Process up to n_frames (stops at missing files). Returns the
        number of frames actually processed.

        Double-buffered: chunk k+1 is loaded and DISPATCHED (using chunk
        k's device carry — no host sync needed) before chunk k's records
        are read back and applied, so the device tracks k+1 while the
        host does k's bookkeeping/IO. If applying chunk k diverges from
        the device scan (per-frame replay or lostRecovery), the
        speculative dispatch used a stale carry and is re-dispatched
        from the corrected host state (failure-path only; results of
        the stale dispatch are discarded unread)."""
        self._ensure_tracker()
        done = 0
        inflight = None
        next_fetch = self.index
        while True:
            started = len(inflight["indices"]) if inflight else 0
            # contiguous prefix only: a mid-sequence gap ends the run
            # (the per-frame fallback would otherwise walk into the
            # missing file), matching the 'stops at missing files'
            # contract
            indices = []
            if n_frames - done - started >= self.chunk:
                for i in range(self.chunk):
                    idx = next_fetch + i
                    if not self._frame_files_exist(idx):
                        break
                    indices.append(idx)
            nxt = None
            if len(indices) == self.chunk:
                carry = inflight["carry"] if inflight else None
                nxt = self._dispatch_chunk(indices, carry=carry)
                next_fetch = indices[-1] + 1
            if inflight is not None:
                applied, clean = self._process_chunk(inflight)
                done += applied
                if not clean and nxt is not None:
                    # host state diverged from the device scan: redo the
                    # speculative dispatch with the corrected carry
                    # (frames stay cached; only the dispatch repeats)
                    nxt = self._dispatch_chunk(
                        nxt["indices"], frames=nxt["frames"])
            inflight = nxt
            if inflight is None:
                break
        # tail: fewer than chunk frames remain (or a gap broke the
        # prefix) — the fixed-shape tracker would recompile, so finish
        # through the exact per-frame path
        while done < n_frames and self._frame_files_exist(self.index):
            self.run()
            done += 1
        return done

    def _dispatch_chunk(self, indices, carry=None, frames=None):
        """Load (or reuse) the chunk's frames and launch the tracker.
        carry: device carry from the previous chunk's tracker output;
        None reads the host state (first chunk / post-divergence)."""
        if frames is None:
            frames = self._load_frames(indices)
        grays, depths = frames
        if carry is None:
            carry = (
                self.curr_kf.features,
                jnp.asarray(self.kf_pos, jnp.float32),
                jnp.asarray(self.robot, jnp.float32),
                jnp.int32(self.lost),
            )
        keys = jax.random.split(self.next_key(), self.chunk)
        carry_out, feats, recs = self._tracker(
            *carry,
            jnp.asarray(grays),   # u8: half the relay upload
            jnp.asarray(depths),  # u16
            keys,
        )
        return {"indices": indices, "frames": frames, "carry": carry_out,
                "feats": feats, "recs": recs}

    def _process_chunk(self, chunk_state) -> tuple:
        """Apply one tracked chunk's records host-side. Returns
        (frames_applied, clean) — clean=False when the per-frame
        replay/recovery path ran (host state no longer matches the
        device carry)."""
        self.maybe_drain_loop_closures()
        indices = chunk_state["indices"]
        feats = chunk_state["feats"]
        recs = np.asarray(chunk_state["recs"])  # ONE readback per chunk

        applied = 0
        for j, idx in enumerate(indices):
            T = recs[j, :16].astype(np.float64).reshape(4, 4)
            norm = float(recs[j, 16])
            ok = recs[j, 18] != 0.0
            new_kf = recs[j, 19] != 0.0
            lost_after = int(recs[j, 20])
            self.index = idx
            self._sync_odometry()
            if not ok and self.replay_on_fail:
                # the per-frame lost branch (last-frame rescue) can
                # promote keyframes the device scan didn't model —
                # replay from here through the exact per-frame path
                applied += self._replay_from(j, indices, feats)
                return applied, False
            if not ok:
                self._log("error_of_transform.log", "9999\n")
                self.lost = lost_after
            else:
                self._log("error_of_transform.log", f"{norm:g}\n")
                self.robot = T @ self.kf_pos
                self.lost = 0
                if new_kf:
                    feat_j = _take(feats, jnp.int32(j))
                    self.generate_keyframe(T, feat_j)
                    if self.loop_closure_detection:
                        self.loop_closure()
                self.last = _take(feats, jnp.int32(j))
                self.last_frame_index = idx
            applied += 1
            if self.lost > self.lost_frames:
                # recovery mutates the graph and the reference keyframe;
                # device results past this frame assumed no recovery —
                # replay the rest through the per-frame path. NB: run()
                # calls lost_recovery BEFORE its index increment, so the
                # recovery keyframe must record frame_index == idx
                # (self.index still at idx here).
                feat_j = _take(feats, jnp.int32(j))
                self.lost_recovery(feat_j)
                self.index = idx + 1  # run()'s post-recovery increment
                for k in range(j + 1, len(indices)):
                    self.index = indices[k]
                    self.run()
                    applied += 1
                return applied, False
            self.index = idx + 1
        return applied, True

    def _replay_from(self, j, indices, feats) -> int:
        """Re-run frames indices[j:] through the per-frame path. `last`
        is set from the chunk's feature stack so the rescue branch sees
        the same previous-frame features the device tracked."""
        if j > 0:
            self.last = _take(feats, jnp.int32(j - 1))
            self.last_frame_index = indices[j - 1]
        applied = 0
        for k in range(j, len(indices)):
            self.index = indices[k]
            self.run()
            applied += 1
        return applied


class StreamingGraphicEnd2(_StreamingMixin, GraphicEnd2):
    """Image-only frontend with chunked on-device tracking (the
    reference's own 'real-time variant' motivation, README:15, taken
    to its TPU conclusion)."""

    def __init__(self, params=None, data_dir: str = "./data",
                 chunk: int = 8):
        super().__init__(params, data_dir=data_dir)
        self._init_streaming(chunk)

    def _make_extract_fn(self):
        extract_img = self.extract_img

        def ext(gray, depth, key):
            del key  # image extractor is deterministic
            return extract_img(gray, depth)

        return ext


class StreamingGraphicEnd(_StreamingMixin, GraphicEnd):
    """Plane-pipeline frontend with chunked on-device tracking.

    The chunk path derives each frame's cloud by backprojecting the
    depth image on device (= convert2PCD semantics, so identical to the
    PCD files for datasets produced by the documented workflow); frames
    that fail to track replay through the per-frame path, which reads
    the PCD files and runs the reference's last-frame rescue exactly.
    """

    replay_on_fail = True

    def __init__(self, params=None, data_dir: str = "./data",
                 chunk: int = 8):
        super().__init__(params, data_dir=data_dir)
        self._init_streaming(chunk)

    def _make_extract_fn(self):
        from . import pipeline
        from ..ops import pointcloud

        extract = self.extract
        intr = self.intr
        z_filter = self.z_filter
        # config escape hatches (readimage honors them on the per-frame
        # path; the chunked extract must match or the two paths silently
        # mix cloud-preprocessing semantics within one run):
        # - voxel_downsample_clouds: applied below, same fixed capacity
        #   as readimage (4x the extractor's point budget);
        # - align_cloud_scale is a no-op by construction here: the chunk
        #   path backprojects the frame's own depth image, so cloud and
        #   depth units are identical (the knob exists for PCD files
        #   written with a different depth factor, ops/pointcloud.
        #   estimate_depth_scale).
        voxel = self.voxel_downsample_clouds
        grid_leaf = self.grid_leaf

        def ext(gray, depth, key):
            xyz, valid = pointcloud.backproject(
                depth, intr.fx, intr.fy, intr.cx, intr.cy, intr.factor)
            xyz = xyz.reshape(-1, 3)
            valid = pointcloud.passthrough_z(
                xyz, valid.reshape(-1), 0.0, z_filter)
            if voxel:
                xyz, _, valid = pointcloud.voxel_downsample(
                    xyz, jnp.zeros_like(xyz), valid, grid_leaf,
                    capacity=min(xyz.shape[0], 4 * pipeline.PLANE_POINTS))
            return extract(gray, depth, xyz, valid, key)

        return ext
