"""End-to-end CLI pipeline test on the synthetic vkitti2 fixture.

Proves the CLIs against REAL file formats (VERDICT round-1 #7): scene
generation -> dataset prep -> initial segmentation -> VO pose/ATE ->
flow/depth export -> fused VPS + VPQ, through the one-command loop
driver (scripts/run_pvo_loop.py), all at --tiny scale on CPU.
"""

import glob
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _run(script, args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", script)] + args,
        cwd=cwd, env=env, capture_output=True, text=True,
        timeout=7200)
    assert r.returncode == 0, \
        f"{script} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r


def test_pvo_loop_on_synth_scene(tmp_path):
    from pvo_tpu.data.synth_scene import write_synth_scene

    data = str(tmp_path / "vkitti")
    write_synth_scene(data, scene="Scene02", n_frames=14)

    # GT panoptic maps + split (reference tools/datasets prep)
    _run("prepare_vkitti.py",
         ["--datapath", data, "--scenes", "Scene02"], str(tmp_path))

    pan_gt = glob.glob(osp.join(data, "Scene02", "clone",
                                "panoptic_gt_id", "*.png"))
    assert len(pan_gt) == 14

    # full loop, one iteration, tiny scale
    _run("run_pvo_loop.py",
         ["--datapath", data, "--scenes", "Scene02", "--iters", "1",
          "--tiny"], str(tmp_path))

    shared = tmp_path / "shared_data"

    # VO trajectory artifact (reference test_vo.py:153-161 format)
    traj = shared / "traj" / "Scene02" / "15-deg-left" / "pvo_traj.txt"
    assert traj.exists()
    rows = np.loadtxt(traj)
    assert rows.shape == (14, 12)
    assert np.all(np.isfinite(rows))

    # flow/depth exports (reference test_vo2.py:128-136)
    flows = glob.glob(str(shared / "full_flow" / "Scene02_*.npy"))
    depths = glob.glob(str(shared / "depth" / "Scene02_*.npy"))
    assert len(flows) == 13 and len(depths) == 13
    fl = np.load(flows[0])
    assert fl.ndim == 3 and fl.shape[-1] == 2

    # fused VPS predictions + VPQ report
    pans = glob.glob(str(shared / "panoptic_segm_fusion" / "inference"
                         / "pan_seg" / "Scene02_*.png"))
    assert len(pans) == 2  # clone 5:1:1 val slice of 14 frames
    vpq = shared / "vpq" / "Scene02" / "vpq-final.txt"
    assert vpq.exists()
    rep = json.loads(vpq.read_text())
    assert {"vpq_all", "vpq_thing", "vpq_stuff"} <= set(rep)

    # feedback: fused segmentation copied into panFPN_segm. Tiny mode
    # runs initial segmentation on 15-deg-left only (the view VO's
    # segment filter consumes; run_pvo_loop.py views gating, round 3),
    # so the clone view's panFPN_segm holds exactly the FUSED val-slice
    # frames the feedback copied in.
    fed = sorted(glob.glob(osp.join(data, "Scene02", "clone",
                                    "panFPN_segm", "*.png")))
    assert [osp.basename(f) for f in fed] == \
        ["rgb_00010.png", "rgb_00011.png"], fed
