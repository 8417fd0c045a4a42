#!/bin/bash
# Reference tools/test_vo_scene.sh: per-scene pose eval + flow/depth
# export over the 5 vkitti2 scenes.
set -e
DATA=${1:-datasets/Virtual_KITTI2}
WEIGHTS=${2:-}
for s in Scene01 Scene02 Scene06 Scene18 Scene20; do
    python scripts/test_vo.py --datapath "$DATA/$s" --segm_filter \
        ${WEIGHTS:+--weights "$WEIGHTS"}
    python scripts/test_vo2.py --datapath "$DATA/$s" \
        ${WEIGHTS:+--weights "$WEIGHTS"}
done
