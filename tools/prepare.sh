#!/bin/sh
# Dataset preparation pipeline (reference tools/prepare.sh:1-9):
# raw rgb/ + depth/ timestamped PNGs -> associate.txt + indexed dirs + pcds.
# Run from the dataset root.
set -e
TOOLS="$(cd "$(dirname "$0")" && pwd)"

python3 "$TOOLS/generateTxt.py" rgb rgb.txt
python3 "$TOOLS/generateTxt.py" depth depth.txt
python3 "$TOOLS/associate.py" rgb.txt depth.txt > associate.txt
python3 "$TOOLS/change2index.py" .
python3 "$TOOLS/img2pcd.py" .
echo "dataset prepared."
