#!/usr/bin/env python3
"""Associate two TUM-format timestamp files by nearest timestamp.

Same CLI surface as the TUM benchmark associate script the reference
vendors (reference tools/associate.py, used by tools/prepare.sh:5-6):
reads two files of `timestamp data...` rows, matches rows whose
timestamps differ by at most --max_difference, prints the joined rows.

This is a first-party implementation (greedy best-match on sorted
candidate pairs — the TUM matching semantics).
"""

from __future__ import annotations

import argparse
import sys


def read_file_list(path: str, offset: float = 0.0):
    """Parse `timestamp v1 v2 ...` rows; '#' comments ignored."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.replace(",", " ").strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            try:
                ts = float(parts[0]) + offset
            except ValueError:
                continue
            out[ts] = parts[1:]
    return out


def associate(first: dict, second: dict, offset: float, max_difference: float):
    """Greedy nearest-timestamp matching: consider all pairs within
    max_difference, take them best-first, each row used once."""
    pairs = []
    second_keys = sorted(second.keys())
    import bisect

    for a in first:
        target = a + offset
        i = bisect.bisect_left(second_keys, target)
        for j in (i - 1, i, i + 1):
            if 0 <= j < len(second_keys):
                b = second_keys[j]
                d = abs(target - b)
                if d < max_difference:
                    pairs.append((d, a, b))
    pairs.sort()
    used_a, used_b, matches = set(), set(), []
    for d, a, b in pairs:
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            matches.append((a, b))
    matches.sort()
    return matches


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("first_file")
    p.add_argument("second_file")
    p.add_argument("--first_only", action="store_true",
                   help="print only the first file's columns")
    p.add_argument("--offset", type=float, default=0.0,
                   help="time offset added to second file's timestamps")
    p.add_argument("--max_difference", type=float, default=0.02,
                   help="max allowed timestamp difference for a match")
    args = p.parse_args(argv)

    first = read_file_list(args.first_file)
    second = read_file_list(args.second_file)
    matches = associate(first, second, args.offset, args.max_difference)

    for a, b in matches:
        if args.first_only:
            print(f"{a:f} " + " ".join(first[a]))
        else:
            print(f"{a:f} " + " ".join(first[a])
                  + f" {b - args.offset:f} " + " ".join(second[b]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
