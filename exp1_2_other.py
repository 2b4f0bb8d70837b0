#!/usr/bin/env python3
"""Second experiment sweep config (reference exp1_2_other.py): the same
anchor x offset protocol with the alternate detector (ORB in the
reference sweep; any detector via --detector). Thin wrapper over
exp1_2.py with different defaults."""

from __future__ import annotations

import sys

import exp1_2


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--detector") for a in argv):
        argv = ["--detector", "ORB"] + argv
    return exp1_2.main(argv)


if __name__ == "__main__":
    sys.exit(main())
