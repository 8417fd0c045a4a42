#!/bin/bash
# Reference tools/initial_segmentation.sh: plain Panoptic FPN over the
# clone + 15-deg-left views, PNGs into datasets/.../panFPN_segm/.
set -e
DATA=${1:-datasets/Virtual_KITTI2}
WEIGHTS=${2:-}
python scripts/initial_segmentation.py --datapath "$DATA" \
    ${WEIGHTS:+--weights "$WEIGHTS"}
