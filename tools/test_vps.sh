#!/bin/bash
# Reference tools/test_vps.sh: fused VPS + tracking + matching + VPQ.
set -e
DATA=${1:-datasets/Virtual_KITTI2}
WEIGHTS=${2:-}
for s in Scene01 Scene02 Scene06 Scene18 Scene20; do
    python scripts/test_vps.py --datapath "$DATA" --scene "$s" \
        ${WEIGHTS:+--weights "$WEIGHTS"}
done
