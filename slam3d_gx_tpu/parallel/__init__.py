"""Multi-chip parallelism layer (SURVEY.md §2.4, §5.7-5.8).

The reference is single-process / single-threaded (no pthread/OpenMP/MPI
anywhere in its src/, SURVEY.md §2.4), so this subsystem is a TPU-first
design, not a port:

- mesh.py        : device mesh construction + jax.distributed bring-up
                   (the framework's NCCL-equivalent is XLA collectives
                   over ICI/DCN);
- registration.py: data-parallel batched pairwise registration (multiPnP
                   fan-out over frame pairs / loop-closure candidates);
- lcdb.py        : fixed-capacity keyframe database with sharded
                   descriptor matching — the "sequence parallel" analog:
                   the keyframe history is the sequence, queries broadcast
                   over the ICI ring against sharded keyframe blocks;
- posegraph.py   : edge-sharded pose-graph normal-equation assembly
                   (psum-reduced) around the dense LM solve.
"""

from . import lcdb, mesh, posegraph, registration  # noqa: F401
