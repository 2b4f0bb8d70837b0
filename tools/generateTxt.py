#!/usr/bin/env python3
"""Generate TUM-style `timestamp path` list files from image directories.

Parity target: reference tools/generateTxt.py:7-26 — filenames are
`<timestamp>.png`; each directory becomes a text file of
`timestamp relpath` rows sorted by timestamp (consumed by associate.py).

Usage: generateTxt.py <dir> <out.txt>   (e.g. rgb/ rgb.txt)
"""

from __future__ import annotations

import os
import sys


def generate(directory: str, out_path: str) -> int:
    rows = []
    for name in os.listdir(directory):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".png", ".jpg"):
            continue
        try:
            ts = float(stem)
        except ValueError:
            continue
        rows.append((ts, os.path.join(os.path.basename(directory.rstrip("/")), name)))
    rows.sort()
    with open(out_path, "w") as f:
        for ts, rel in rows:
            f.write(f"{ts:f} {rel}\n")
    return len(rows)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 1
    n = generate(argv[0], argv[1])
    print(f"{argv[1]}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
