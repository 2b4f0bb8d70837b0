"""slam3d_gx_tpu — a TPU-native RGB-D SLAM framework.

A from-scratch re-design of the capabilities of gaoxiang12/slam3d_gx
(reference: a 2014 single-threaded C++/OpenCV/PCL/g2o Kinect SLAM pipeline)
as an idiomatic JAX/XLA/Pallas framework:

- functional core: fixed-shape, masked tensor kernels (batched-hypothesis
  RANSAC, conv-pyramid feature detection, MXU matcher, vmapped Gauss-Newton
  PnP, batched pose-graph linearization), all jit-compiled;
- imperative shell: host-side dataset codecs, the per-frame SLAM state
  machine, file contracts (.g2o / keyframe.txt / trajectory.txt / PCD) that
  stay byte-compatible with the reference tooling;
- parallel layer: jax.sharding meshes for data-parallel registration sweeps
  and a sharded keyframe database for loop closure.

Layer map mirrors SURVEY.md; parity citations point into /root/reference.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compile cache, opt-in via SLAM3D_COMPILE_CACHE=1
    (or an explicit JAX_COMPILATION_CACHE_DIR): the frontend's large
    jitted programs take minutes to compile on some TPU toolchains.
    Not enabled by default — cache entries AOT-compiled on a machine
    with more CPU features than the host can SIGILL when reloaded
    (observed with remote-compile toolchains)."""
    if not (_os.environ.get("SLAM3D_COMPILE_CACHE")
            or _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        return
    path = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "slam3d_gx_tpu_xla"),
    )
    try:
        import jax

        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a requirement
        pass


_enable_compilation_cache()


def _apply_platform_override():
    """SLAM3D_PLATFORM=cpu|tpu|... forces the jax backend at import
    time (before any device query). Needed because JAX_PLATFORMS in the
    environment is pre-empted on hosts whose sitecustomize imports jax
    first — see utils/platform.py."""
    if _os.environ.get("SLAM3D_PLATFORM"):
        try:
            from .utils.platform import select_platform

            select_platform()
        except Exception:
            pass


_apply_platform_override()
