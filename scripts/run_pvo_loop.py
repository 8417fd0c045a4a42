"""One-command PVO loop driver (reference README.md:13-44).

Drives the full pipeline per scene, iterating the VO<->VPS exchange:

  1. initial segmentation (plain Panoptic FPN -> panFPN_segm PNGs,
     reference tools/initial_segmentation.sh),
  2. per iteration:
     a. test_vo   — pose / ATE on the 15-deg-left view (segm filter
        reads panFPN_segm), writes shared_data/traj,
     b. test_vo2  — flow/depth export on the clone view into
        shared_data/{full_flow,depth},
     c. test_vps  — flow-guided fused VPS + tracking/matching + VPQ on
        the clone val slice,
     d. feedback: fused pan_seg PNGs replace the corresponding
        panFPN_segm frames (reference tools/split_init_segm.py role),
        so the next iteration's VO sees the improved segmentation.

"You can get the results in the paper by iterating multiple times"
(reference README.md:44).

--tiny runs every stage at reduced scale with the 1-block backbone and
eager VPS apply — the CI configuration for the synthetic fixture
(pvo_tpu/data/synth_scene.py) on a CPU host.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))


import argparse
import glob
import os
import os.path as osp
import shutil
import subprocess
import sys

SCRIPTS = osp.dirname(osp.abspath(__file__))


def run_stage(script, args_list):
    cmd = [sys.executable, osp.join(SCRIPTS, script)] + args_list
    print(f"[pvo_loop] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True)


def feedback_segmentation(shared_data, datapath, scene, view="clone"):
    """Copy fused pan_seg PNGs over the scene's panFPN_segm frames
    (reference split_init_segm.py:12-36 semantics, applied to the
    fused output instead of the initial one)."""
    src_dir = osp.join(shared_data, "panoptic_segm_fusion",
                       "inference", "pan_seg")
    dst_dir = osp.join(datapath, scene, view, "panFPN_segm")
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for f in sorted(glob.glob(osp.join(src_dir, f"{scene}_*.png"))):
        name = osp.basename(f).split("_", 1)[1]
        shutil.copyfile(f, osp.join(dst_dir, name))
        n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--scenes", nargs="+", default=["Scene02"])
    p.add_argument("--iters", type=int, default=1,
                   help="PVO loop iterations (README.md:44)")
    p.add_argument("--shared_data", default="shared_data")
    p.add_argument("--weights_vo", default=None)
    p.add_argument("--weights_vps", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--vo_image_size", type=int, nargs=2, default=None)
    args = p.parse_args()

    tiny_vps = (["--tiny", "--scale", "0.125"] if args.tiny else [])
    vo_size = args.vo_image_size or ([96, 320] if args.tiny
                                     else [240, 808])
    vo2_size = [96, 320] if args.tiny else [376, 1248]
    vo_extra = ["--warmup", "5", "--buffer", "64"] if args.tiny else []
    vo2_iters = ["--iters", "4"] if args.tiny else []

    wvo = (["--weights", args.weights_vo] if args.weights_vo else [])
    wvps = (["--weights", args.weights_vps] if args.weights_vps else [])

    # tiny mode: only the 15-deg-left view's initial segmentation is
    # consumed downstream (test_vo's segment filter); the clone view's
    # panFPN_segm is produced by the fusion feedback instead
    views = (["--views", "15-deg-left"] if args.tiny else [])
    run_stage("initial_segmentation.py",
              ["--datapath", args.datapath, "--scenes"] + args.scenes +
              views + tiny_vps + wvps)

    for it in range(args.iters):
        print(f"[pvo_loop] ===== iteration {it + 1}/{args.iters} =====",
              flush=True)
        for scene in args.scenes:
            scene_path = osp.join(args.datapath, scene)
            run_stage("test_vo.py",
                      ["--datapath", scene_path, "--segm_filter",
                       "--shared_data", args.shared_data,
                       "--image_size"] + [str(v) for v in vo_size] +
                      vo_extra + wvo)
            run_stage("test_vo2.py",
                      ["--datapath", scene_path, "--mode", "train",
                       "--shared_data", args.shared_data,
                       "--image_size"] + [str(v) for v in vo2_size] +
                      vo2_iters + wvo)
            run_stage("test_vps.py",
                      ["--datapath", args.datapath, "--scene", scene,
                       "--shared_data", args.shared_data] +
                      tiny_vps + wvps)
            n = feedback_segmentation(args.shared_data, args.datapath,
                                      scene)
            print(f"[pvo_loop] {scene}: fed back {n} fused "
                  f"segmentations", flush=True)


if __name__ == "__main__":
    main()
