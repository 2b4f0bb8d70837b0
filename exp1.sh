#!/bin/sh
# Curated single-pair registration checks (reference exp1.sh:3-10):
# pairs where the planar pipeline historically beat plain matching
# (1558/1566) and a featureless regression pair (295/270). Adjust the
# indices to your dataset; both modes are run for comparison.
set -e
BIN="$(cd "$(dirname "$0")" && pwd)/bin/exp1_2"
P1=${1:-1558}; P2=${2:-1566}
"$BIN" "$P1" "$P2" GFTT SIFT p
"$BIN" "$P1" "$P2" GFTT SIFT n
echo "results appended to data/exp1/error.log"
