"""Live HTTP viewer (pvo_tpu/vo/live_viewer.py) — the headless-TPU
redesign of the reference's interactive Open3D process
(VO_Module/droid_slam/visualization.py:55-154)."""

import json
import urllib.request

import numpy as np

import jax.numpy as jnp

from pvo_tpu.lie import se3
from pvo_tpu.vo.live_viewer import LiveViewer, _frustum_lines
from pvo_tpu.vo.video import DepthVideo


def _toy_video(n=6, hw=(64, 64)):
    v = DepthVideo(image_size=hw, buffer=16)
    rng = np.random.RandomState(0)
    v.counter = n
    tangents = 0.05 * rng.randn(n, 6).astype(np.float32)
    tangents[:, 2] = 0.2 * np.arange(n)          # forward motion
    v.poses = v.poses.at[:n].set(se3.exp(jnp.asarray(tangents)))
    v.disps = v.disps.at[:n].set(
        jnp.asarray(0.5 + 0.1 * rng.rand(n, *v.disps.shape[1:])
                    .astype(np.float32)))
    v.images = v.images.at[:n].set(jnp.asarray(
        rng.randint(0, 255, (n,) + hw + (3,), np.uint8)))
    v.intrinsics = v.intrinsics.at[:n].set(
        jnp.asarray([8.0, 8.0, 4.0, 4.0]))
    return v


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/{path}", timeout=10) as r:
        return r.status, r.read()


def test_serves_page_and_state():
    v = _toy_video()
    viewer = LiveViewer(v, port=0, decimate=4)
    try:
        status, body = _get(viewer.port, "")
        assert status == 200 and b"webgl" in body

        viewer.update()
        status, body = _get(viewer.port, "state.json")
        assert status == 200
        s = json.loads(body)
        assert s["counter"] == 6
        assert len(s["trajectory"]) == 6
        pts = np.asarray(s["points"], np.float64)
        assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 0
        assert np.all(np.isfinite(pts))
        cols = np.asarray(s["colors"])
        assert cols.shape == pts.shape
        assert cols.min() >= 0 and cols.max() <= 255
        # 8 segments per frustum (4 apex rays + 4 base edges)
        assert len(s["frusta"]) == 8 * min(6, 8)
    finally:
        viewer.close()


def test_update_tracks_counter():
    v = _toy_video(n=4)
    viewer = LiveViewer(v, port=0, decimate=4)
    try:
        viewer.update()
        s0 = json.loads(_get(viewer.port, "state.json")[1])
        v.counter = 6
        viewer.update()
        s1 = json.loads(_get(viewer.port, "state.json")[1])
        assert s0["counter"] == 4 and s1["counter"] == 6
        assert len(s1["trajectory"]) == 6
    finally:
        viewer.close()


def test_frustum_geometry():
    eye = np.eye(4)[None]
    segs = np.asarray(_frustum_lines(eye, scale=1.0))
    assert segs.shape == (8, 2, 3)
    # interleaved: even = apex ray (starts at camera center),
    # odd = base edge (both endpoints on the z=1 plane)
    assert np.allclose(segs[0::2, 0], 0.0)
    assert np.allclose(segs[1::2, :, 2], 1.0)
