"""Backend selection + relay health pre-flight for the CLI surface.

The reference binaries always run on the host CPU; this framework's
default backend is whatever jax finds (the TPU when attached). Two
operational realities make an explicit override necessary:

- `JAX_PLATFORMS` in the environment is pre-empted on machines whose
  sitecustomize imports jax before user code runs, so the documented
  env-var route silently does nothing there. The config API
  (`jax.config.update("jax_platforms", ...)`) still works as long as it
  runs before the first device query — which is why every CLI calls
  `select_platform()` first thing.
- The remote-relay TPU transport can wedge (probes hang indefinitely
  rather than fail), taking any CLI run down with it. `probe(timeout)`
  runs a tiny matmul + readback in a *subprocess* with a hard kill so a
  wedged relay is detected in bounded time instead of hanging the
  caller.

Env knob: SLAM3D_PLATFORM=cpu|tpu|... (empty/unset = jax default).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SRC = (
    "from slam3d_gx_tpu.utils.platform import select_platform; "
    "select_platform(); "
    "import numpy as np; import jax; "
    "x = jax.numpy.ones((8, 8)); "
    "print(float(np.asarray(x @ x)[0, 0]))"
)


def select_platform(jax=None) -> str | None:
    """Apply SLAM3D_PLATFORM via the config API (env-var-proof).
    Returns the platform applied, or None when unset/invalid."""
    plat = os.environ.get("SLAM3D_PLATFORM", "").strip().lower()
    if not plat:
        return None
    if jax is None:
        import jax
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        return None
    return plat


def ensure_backend_or_cpu(env_key: str | None = None,
                          timeout: float = 60.0, log=None) -> str | None:
    """Backend policy for benchmark harnesses: an explicit override
    (env_key, then SLAM3D_PLATFORM) wins; otherwise probe the default
    backend in a bounded subprocess and force cpu when it is
    wedged/unreachable. Returns the platform forced, or None when the
    jax default stays in effect. Call BEFORE importing slam3d_gx_tpu."""
    plat = (os.environ.get(env_key, "") if env_key else "").strip().lower()
    if plat:
        os.environ["SLAM3D_PLATFORM"] = plat
        # apply directly: importing this module already imported the
        # slam3d_gx_tpu package, so its import-time override (which ran
        # before the env var was set) will not fire again
        return select_platform()
    if os.environ.get("SLAM3D_PLATFORM"):
        return select_platform()
    if not probe(timeout=timeout):
        if log is not None:
            log("device probe failed/wedged -> cpu fallback")
        os.environ["SLAM3D_PLATFORM"] = "cpu"
        return select_platform()
    return None


def probe(timeout: float = 60.0, platform: str | None = None) -> bool:
    """True iff a subprocess can compile+execute+read back an 8x8 matmul
    on the target backend within `timeout` seconds. A wedged relay
    hangs (never errors), so the subprocess is hard-killed on timeout —
    the only reliable bounded-time health check on this transport."""
    env = dict(os.environ)
    if platform:
        env["SLAM3D_PLATFORM"] = platform
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            env=env, timeout=timeout,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
