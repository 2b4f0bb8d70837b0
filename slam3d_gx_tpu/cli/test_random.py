"""testRandom: RNG sanity check for the loop-closure sampler.

Parity target: reference src/testRandom.cpp:7-15 (100 draws of rand()%100).
Framework delta: the stream is seeded (config `seed`) instead of
srand(time(0)) so runs are reproducible.
"""

from __future__ import annotations

import random
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    seed = int(argv[0]) if argv else 0
    rng = random.Random(seed)
    for _ in range(100):
        print(rng.randrange(100), end=" ")
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
