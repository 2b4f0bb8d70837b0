"""Multi-chip pose-graph optimization.

The reference's backend is a single-threaded g2o Levenberg solve
(reference src/GraphicEnd.cpp:669-670). The TPU backend
(backend/pose_graph.py) already linearizes all edges in one vmapped
batch; the multi-chip path shards that edge batch over the "dp" mesh
axis — each device linearizes its edge shard and scatter-adds into the
(6V,6V) normal equations, which XLA reduces with one psum before the
replicated dense solve. No hand-written collectives: the sharding
annotations on the edge arrays are the whole program.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from ..backend.pose_graph import PoseGraphOptimizer


def optimize_sharded(opt: PoseGraphOptimizer, mesh: Mesh,
                     n_iters: int = 200) -> float:
    """Run the optimizer's LM loop with edges sharded over mesh's dp axis."""
    return opt.optimize(n_iters=n_iters, mesh=mesh)
