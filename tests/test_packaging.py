"""Packaging surface: pyproject console scripts must resolve.

The reference's install surface is its CMake build producing ten
binaries (reference CMakeLists.txt; bin/ layout per README:43-67).
Ours is pyproject.toml console scripts — this test keeps every declared
entry point importable and callable, so `pip install -e .` can never
ship a dangling script.
"""

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:  # py311+: stdlib tomllib
    import tomllib
except ModuleNotFoundError:  # pragma: no cover
    tomllib = None
    import tomli as tomllib  # type: ignore[no-redef]


def _load_scripts():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        data = tomllib.load(f)
    return data["project"]["scripts"]


def test_all_reference_binaries_have_entry_points():
    scripts = _load_scripts()
    # the ten reference binaries (reference CMakeLists target list) +
    # the streaming bonus CLI
    expected = {
        "run_SLAM", "run_SLAM_imageonly", "run_SLAM_streaming",
        "generateTrajectory", "saveOutput", "viewLC", "convert2PCD",
        "planarFeatures", "exp1", "exp1_2", "testRandom",
    }
    assert expected <= set(scripts)


def test_entry_points_resolve_to_callables():
    for name, target in _load_scripts().items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_entry_points_accept_no_args():
    # console scripts invoke main() with no arguments; every CLI main
    # must default argv to sys.argv[1:]
    import inspect
    for name, target in _load_scripts().items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        sig = inspect.signature(fn)
        for p in sig.parameters.values():
            assert p.default is not inspect.Parameter.empty or p.kind in (
                inspect.Parameter.VAR_POSITIONAL,
                inspect.Parameter.VAR_KEYWORD,
            ), f"{name}: parameter {p.name} has no default"


def test_bin_wrappers_match_entry_points():
    # the repo-local bin/ wrappers and the pip scripts must expose the
    # same surface (bin/ has no testRandom-less subset drift)
    scripts = set(_load_scripts())
    bins = set(os.listdir(os.path.join(REPO, "bin")))
    assert bins <= scripts, f"bin/ scripts missing from pyproject: {bins - scripts}"
