"""Pose-graph backend: first-party SE(3) Levenberg-Marquardt in JAX.

TPU-native replacement for the reference's g2o assembly
(SLAMEnd: LinearSolverCSparse -> BlockSolver_6_3 ->
OptimizationAlgorithmLevenberg + Cauchy robust kernel,
reference src/GraphicEnd.h:223-256) and SparseOptimizer::optimize
(src/GraphicEnd.cpp:669-670, optimize_step=200).

Re-architecture: edges are linearized in one vmapped batch (residual =
se3_log(Zij^-1 Xi^-1 Xj), Jacobians by forward-mode autodiff of the local
perturbation), Cauchy weights applied per edge, and the normal equations
are scatter-assembled into a dense (6V,6V) system solved with one Cholesky
— at SLAM scale (V ~ 10^2..10^3) the dense solve is a single MXU-friendly
kernel, which beats sparse CSparse-style factorization on this hardware.
Gauge fixing: `fixed` vertices get identity rows/cols (vertex 0 is fixed by
the frontend, reference src/GraphicEnd.cpp:144).

Shapes are padded to capacity buckets so the jitted step recompiles only
when the graph outgrows its bucket.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3 as se3_np
from ..io import g2o_io
from ..ops import lie

_HI = jax.lax.Precision.HIGHEST


def _bucket(n: int, base: int = 16) -> int:
    c = base
    while c < n:
        c *= 2
    return c


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _edge_residual(Ti, Tj, Zinv):
    return lie.se3_log(_mm(_mm(Zinv, lie.inv_T(Ti)), Tj))


def _edge_jacobians(Ti, Tj, Zinv):
    """d residual / d (xi_i, xi_j) for local right perturbations
    Ti <- Ti @ exp(xi_i), Tj <- Tj @ exp(xi_j)."""

    def f(xi):
        xii, xij = xi[:6], xi[6:]
        return _edge_residual(_mm(Ti, lie.se3_exp(xii)), _mm(Tj, lie.se3_exp(xij)), Zinv)

    J = jax.jacfwd(f)(jnp.zeros(12, dtype=Ti.dtype))
    return J[:, :6], J[:, 6:]


@functools.partial(jax.jit, static_argnames=("n_iters", "vcap"))
def _optimize_padded(
    poses, fixed, e_i, e_j, e_Zinv, e_info, e_robust, e_valid,
    n_iters: int, vcap: int, cauchy_delta: float = 1.0,
):
    """LM loop over padded arrays. poses (Vc,4,4); edges padded to Ec."""

    def chi2_and_system(poses):
        Ti = poses[e_i]
        Tj = poses[e_j]
        r = jax.vmap(_edge_residual)(Ti, Tj, e_Zinv)  # (E,6)
        Jii, Jjj = jax.vmap(_edge_jacobians)(Ti, Tj, e_Zinv)
        # chi2 per edge
        ir = jnp.einsum("eab,eb->ea", e_info, r, precision=_HI)
        chi = jnp.sum(r * ir, axis=1)
        # Cauchy: w = rho'(chi) = 1 / (1 + chi/delta^2); non-robust edges w=1
        w = jnp.where(e_robust, 1.0 / (1.0 + chi / (cauchy_delta**2)), 1.0)
        w = jnp.where(e_valid, w, 0.0)
        info_w = e_info * w[:, None, None]

        JtIJ_ii = jnp.einsum("eka,ekl,elb->eab", Jii, info_w, Jii, precision=_HI)
        JtIJ_jj = jnp.einsum("eka,ekl,elb->eab", Jjj, info_w, Jjj, precision=_HI)
        JtIJ_ij = jnp.einsum("eka,ekl,elb->eab", Jii, info_w, Jjj, precision=_HI)
        g_i = jnp.einsum("eka,ekl,el->ea", Jii, info_w, r, precision=_HI)
        g_j = jnp.einsum("eka,ekl,el->ea", Jjj, info_w, r, precision=_HI)

        H = jnp.zeros((vcap, vcap, 6, 6), poses.dtype)
        H = H.at[e_i, e_i].add(JtIJ_ii)
        H = H.at[e_j, e_j].add(JtIJ_jj)
        H = H.at[e_i, e_j].add(JtIJ_ij)
        H = H.at[e_j, e_i].add(jnp.swapaxes(JtIJ_ij, -1, -2))
        g = jnp.zeros((vcap, 6), poses.dtype)
        g = g.at[e_i].add(g_i)
        g = g.at[e_j].add(g_j)
        chi_total = jnp.sum(jnp.where(e_valid, w * chi, 0.0))
        return chi_total, H, g

    free = ~fixed  # (Vc,)

    def apply_delta(poses, dx):
        dx = dx.reshape(vcap, 6) * free[:, None]
        return _mm(poses, lie.se3_exp(dx))

    def solve(H, g, lam):
        # gauge fixing + padding: fixed/invalid vertices get identity blocks
        Hd = H.reshape(vcap, vcap, 6, 6).transpose(0, 2, 1, 3).reshape(vcap * 6, vcap * 6)
        gd = g.reshape(-1)
        fmask = jnp.repeat(free, 6)
        Hd = jnp.where(fmask[:, None] & fmask[None, :], Hd, 0.0)
        diag = jnp.arange(vcap * 6)
        Hd = Hd.at[diag, diag].add(jnp.where(fmask, lam * (jnp.diagonal(Hd) + 1e-6), 1.0))
        gd = jnp.where(fmask, gd, 0.0)
        return jnp.linalg.solve(Hd, -gd)

    def step(carry, _):
        poses, lam = carry
        chi, H, g = chi2_and_system(poses)
        dx = solve(H, g, lam)
        new_poses = apply_delta(poses, dx)
        new_chi, _, _ = chi2_and_system(new_poses)
        better = new_chi < chi
        poses = jnp.where(better, new_poses, poses)
        lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4.0, 1e6))
        return (poses, lam), chi

    (poses, _), chis = jax.lax.scan(step, (poses, jnp.float32(1e-4)), None, length=n_iters)
    final_chi, _, _ = chi2_and_system(poses)
    return poses, final_chi, chis


class PoseGraphOptimizer:
    """Host wrapper: owns a g2o_io.Graph, runs the jitted LM core."""

    def __init__(self, graph: Optional[g2o_io.Graph] = None):
        self.graph = graph if graph is not None else g2o_io.Graph()

    # --- graph building (g2o SparseOptimizer surface analog) ----------
    def add_vertex(self, vid: int, T: np.ndarray, fixed: bool = False):
        self.graph.add_vertex(vid, T, fixed)

    def add_edge(self, id1: int, id2: int, T: np.ndarray, information: np.ndarray, robust: bool = False):
        self.graph.add_edge(id1, id2, T, information, robust)

    def vertex_estimate(self, vid: int) -> np.ndarray:
        return self.graph.vertices[vid].T

    def save(self, path: str):
        g2o_io.save_g2o(self.graph, path)

    def load(self, path: str):
        self.graph = g2o_io.load_g2o(path)

    # --- optimization ---------------------------------------------------
    def optimize(self, n_iters: int = 200, dtype=jnp.float32, mesh=None) -> float:
        """Run LM. With `mesh`, edge arrays are sharded over its "dp" axis
        and XLA partitions the batched linearization across devices,
        psum-reducing the scatter-assembled normal equations (the
        multi-chip backend path, SURVEY.md §2.4 item 5)."""
        g = self.graph
        if not g.vertices or not g.edges:
            return 0.0
        ids = sorted(g.vertices)
        idx_of = {vid: k for k, vid in enumerate(ids)}
        V = len(ids)
        E = len(g.edges)
        vcap = _bucket(V)
        ecap = _bucket(E)

        poses = np.stack([g.vertices[v].T for v in ids]).astype(np.float32)
        poses = np.concatenate(
            [poses, np.tile(np.eye(4, dtype=np.float32), (vcap - V, 1, 1))]
        )
        fixed = np.zeros(vcap, bool)
        for k, vid in enumerate(ids):
            fixed[k] = g.vertices[vid].fixed
        fixed[V:] = True  # padding vertices are pinned

        e_i = np.zeros(ecap, np.int32)
        e_j = np.zeros(ecap, np.int32)
        e_Zinv = np.tile(np.eye(4, dtype=np.float32), (ecap, 1, 1))
        e_info = np.tile(np.eye(6, dtype=np.float32), (ecap, 1, 1))
        e_robust = np.zeros(ecap, bool)
        e_valid = np.zeros(ecap, bool)
        for k, e in enumerate(g.edges):
            e_i[k] = idx_of[e.id1]
            e_j[k] = idx_of[e.id2]
            e_Zinv[k] = se3_np.inverse(e.T).astype(np.float32)
            e_info[k] = e.information.astype(np.float32)
            e_robust[k] = e.robust
            e_valid[k] = True

        dev_poses = jnp.asarray(poses, dtype=dtype)
        dev_fixed = jnp.asarray(fixed)
        edge_arrays = [
            jnp.asarray(e_i),
            jnp.asarray(e_j),
            jnp.asarray(e_Zinv, dtype=dtype),
            jnp.asarray(e_info, dtype=dtype),
            jnp.asarray(e_robust),
            jnp.asarray(e_valid),
        ]
        if mesh is not None and "dp" in mesh.shape and ecap % mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            dp = NamedSharding(mesh, PartitionSpec("dp"))
            dev_poses = jax.device_put(dev_poses, rep)
            dev_fixed = jax.device_put(dev_fixed, rep)
            edge_arrays = [jax.device_put(a, dp) for a in edge_arrays]

        poses_out, final_chi, _ = _optimize_padded(
            dev_poses,
            dev_fixed,
            *edge_arrays,
            n_iters=n_iters,
            vcap=vcap,
        )
        poses_out = np.asarray(poses_out, dtype=np.float64)
        for k, vid in enumerate(ids):
            if not g.vertices[vid].fixed:
                # re-orthonormalize before storing (f32 drift)
                T = poses_out[k]
                q = se3_np.rot_to_quat(T[:3, :3])
                g.vertices[vid].T = se3_np.make_isometry(se3_np.quat_to_rot(q), T[:3, 3])
        return float(final_chi)


class SLAMEnd:
    """Reference-parity backend shell (src/GraphicEnd.h:226-256):
    owns the global optimizer; `robust_kernel` config selects Cauchy
    weighting on loop-closure edges."""

    def __init__(self):
        self.optimizer = PoseGraphOptimizer()

    def init(self, graphic_end=None):
        self.graphic_end = graphic_end

    @property
    def globalOptimizer(self) -> PoseGraphOptimizer:  # noqa: N802 (parity)
        return self.optimizer
