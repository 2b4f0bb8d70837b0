#!/usr/bin/env python3
"""Copy associated rgb/depth files to index-named directories.

Parity target: reference tools/change2index.py:4-15 — reads
associate.txt rows (`ts rgb_path ts dep_path ...`), copies the i-th
row's images to `rgb_index/<i>.png` and `dep_index/<i>.png` (1-based),
producing the on-disk contract the SLAM binaries consume
(reference src/GraphicEnd.cpp:271-276).

Usage: change2index.py [dataset_root] (default .)
"""

from __future__ import annotations

import os
import shutil
import sys


def change2index(root: str = ".") -> int:
    rgb_dir = os.path.join(root, "rgb_index")
    dep_dir = os.path.join(root, "dep_index")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    n = 0
    with open(os.path.join(root, "associate.txt")) as f:
        for i, line in enumerate(f, start=1):
            parts = line.split()
            if len(parts) < 4:
                continue
            shutil.copy(os.path.join(root, parts[1]),
                        os.path.join(rgb_dir, f"{i}.png"))
            shutil.copy(os.path.join(root, parts[3]),
                        os.path.join(dep_dir, f"{i}.png"))
            n = i
    return n


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    root = argv[0] if argv else "."
    n = change2index(root)
    print(f"indexed {n} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
