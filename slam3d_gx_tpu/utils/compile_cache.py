"""Persistent, pre-seedable XLA compile cache (cold-start taming).

The flagship frontend program takes 1.5-2 min to build on the remote
TPU toolchain (BENCH_r02: 136 s cold vs 47 s with a warm cache), so a
fresh machine pays minutes before the first pose. This module keys a
persistent compile cache on the exact platform build and — unlike the
round-2 bench-only version — lives IN THE REPO, so cache entries
produced by a benchmark run can be committed and ship with the source:
a fresh checkout starts warm on any machine with the same platform
build (different builds hash to a different directory and simply miss,
which is the round-1 SIGILL-safe behavior).

min_compile_time is 0 so the long tail of small eager-op programs
(~0.4 s each, dozens per pipeline) is cached too — they are what kept
the round-2 "warm" first step at 47 s.

Env knobs: SLAM3D_NO_CACHE=1 disables; SLAM3D_CACHE_DIR overrides the
repo-local root (e.g. to a fast scratch disk).
"""

from __future__ import annotations

import hashlib
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _host_fingerprint() -> str:
    """CPU-microarchitecture fingerprint: machine arch + model name +
    feature flags (the bits that decide which ISA extensions XLA:CPU
    codegen may emit)."""
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in ("model name", "flags", "Features"):
                    parts.append(line.split(":", 1)[1].strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return "|".join(parts)


def enable(jax) -> str | None:
    """Point jax at the platform-keyed cache dir; returns the path or
    None when disabled/unavailable. Safe to call more than once."""
    if os.environ.get("SLAM3D_NO_CACHE") or os.environ.get("BENCH_NO_CACHE"):
        return None
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # an explicit cache (e.g. the test suite's) wins
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    try:
        ver = jax.devices()[0].client.platform_version
    except Exception:
        return None
    if "axon" in ver.lower() and not os.environ.get("SLAM3D_FORCE_CACHE"):
        # Measured on the axon relay (round 3): executing an executable
        # deserialized from the jax persistent cache fails with
        # FailedPrecondition or hangs — the relay only accepts
        # executables it compiled in-session, and it keeps its own
        # server-side compile cache anyway. Never enable the jax cache
        # there unless explicitly forced.
        return None
    if jax.default_backend() == "cpu":
        # platform_version does NOT capture the host CPU
        # microarchitecture for the cpu backend — an executable
        # compiled on one machine can SIGILL on another with the same
        # jax build string (the round-1 failure mode). Fold a host
        # fingerprint into the key so committed entries from a
        # different machine miss instead of deserializing.
        ver = ver + "|" + _host_fingerprint()
    key = hashlib.sha1(ver.encode()).hexdigest()[:12]
    root = os.environ.get("SLAM3D_CACHE_DIR") or os.path.join(
        _REPO_ROOT, ".xla_cache")
    path = os.path.join(root, f"{jax.default_backend()}_{key}")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        path = f"/tmp/slam3d_xla_cache_{jax.default_backend()}_{key}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
