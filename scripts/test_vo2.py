"""VO flow/depth export (reference
VO_Module/evaluation_scripts/test_vo2.py): run DroidNet directly on
consecutive frame pairs at 376x1248 with GT poses, 15 iterations, and
save per-frame full flow (.npy, resized to 375x1242) and 1/8-res
disparity (.npy) into shared_data/ for the VPS fusion stage.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import glob
import os
import os.path as osp

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--mode", default="val")
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--shared_data", default="shared_data")
    p.add_argument("--image_size", type=int, nargs=2,
                   default=[376, 1248],
                   help="network input size (reference test_vo2 "
                        "geometry is 376x1248)")
    p.add_argument("--flow_size", type=int, nargs=2,
                   default=[375, 1242],
                   help="full-flow .npy output size (vkitti native)")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from pvo_tpu.utils.io import (VKITTI_INTRINSICS, decode_vkitti_depth,
                                  vkitti_poses_tq)
    from pvo_tpu.vo.net.droidnet import DroidNet
    from pvo_tpu.vo.system import init_params

    split = {"train": "clone", "val": "15-deg-left",
             "test": "30-deg-right"}[args.mode]
    base = osp.join(args.datapath, split)
    images = sorted(glob.glob(osp.join(base,
                                       "frames/rgb/Camera_0/*.jpg")))
    poses = vkitti_poses_tq(osp.join(base, "extrinsic.txt"))

    H, W = args.image_size
    h, w = H // 8, W // 8
    intr = VKITTI_INTRINSICS.copy()

    model = DroidNet()
    if args.weights:
        from pvo_tpu.utils.convert import load_droidnet_torch
        trees = load_droidnet_torch(args.weights)
        params = {"params": {
            "fnet": trees["fnet"]["params"],
            "cnet": trees["cnet"]["params"],
            "update": trees["update"]["params"],
            "agg": trees["agg"]["params"]}}
    else:
        from pvo_tpu.vo.system import make_modules
        params_split = init_params(make_modules(), (64, 96))
        params = {"params": {
            k: params_split[k]["params"]
            for k in ("fnet", "cnet", "update", "agg")}}

    ii = np.array([0, 1])
    jj = np.array([1, 0])

    scene = args.datapath.rstrip("/").rsplit("/")[-1]
    flow_dir = osp.join(args.shared_data, "full_flow")
    depth_dir = osp.join(args.shared_data, "depth")
    os.makedirs(flow_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    def fwd(params, p2, imgs, disps, intr8):
        out = model.apply(params, p2, imgs, disps, intr8, ii, jj,
                          num_steps=args.iters, ret_flow=True,
                          downsample=True, final_only=True,
                          corr_impl="pallas")
        return out["flows"][-1], out["disps_up"][-1]

    jfwd = jax.jit(fwd)

    for t in range(len(images) - 1):
        pair = []
        for f in images[t:t + 2]:
            img = cv2.imread(f)
            h0, w0 = img.shape[:2]
            img = cv2.resize(img, (W, H))
            pair.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        imgs = jnp.asarray(np.stack(pair)[None], jnp.uint8)

        sx, sy = W / w0, H / h0
        intr_t = intr * np.array([sx, sy, sx, sy], np.float32)
        intr8 = jnp.asarray(np.tile(intr_t / 8.0, (1, 2, 1)))

        p2 = jnp.asarray(poses[t:t + 2][None])
        disps = jnp.ones((1, 2, h, w), jnp.float32)

        flows, disps_up = jfwd(params, p2, imgs, disps, intr8)
        flow = np.asarray(flows[0, 0])  # edge 0->1 at 1/8 res
        FH, FW = args.flow_size
        flow_full = cv2.resize(flow * 8.0, (FW, FH))
        flow_full *= np.array([FW / W, FH / H], np.float32)

        name = osp.basename(images[t]).split(".")[0]
        np.save(osp.join(flow_dir, f"{scene}_{name}.npy"), flow_full)
        np.save(osp.join(depth_dir, f"{scene}_{name}.npy"),
                np.asarray(disps_up[0, 0, 3::8, 3::8]))
        if t % 50 == 0:
            print(f"{scene} frame {t}/{len(images) - 1}")


if __name__ == "__main__":
    main()
