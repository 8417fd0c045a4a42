"""StereoStream (reference stream.py:127-186) + demo-path stream tests."""

import os

import numpy as np
import pytest

from pvo_tpu.data.streams import ImageStream, StereoStream

cv2 = pytest.importorskip("cv2")


def _write_scene(tmp_path, n=4, hw=(48, 64), right=True):
    for side in (["image_left", "image_right"] if right
                 else ["image_left"]):
        os.makedirs(tmp_path / side, exist_ok=True)
    rng = np.random.RandomState(0)
    for t in range(n):
        img = rng.randint(0, 255, hw + (3,), np.uint8)
        cv2.imwrite(str(tmp_path / "image_left" / f"{t:06d}.png"), img)
        if right:
            cv2.imwrite(str(tmp_path / "image_right" / f"{t:06d}.png"),
                        img[:, ::-1])


def test_stereo_stream_pairs_and_scaling(tmp_path):
    _write_scene(tmp_path, n=4)
    # drop one right image: that left frame must be skipped
    os.remove(tmp_path / "image_right" / "000002.png")
    intr = [100.0, 110.0, 32.0, 24.0]
    stream = StereoStream(str(tmp_path), intr, image_size=(24, 32))
    assert len(stream) == 3
    ts = [t for t, *_ in stream]
    assert ts == [0.0, 1.0, 3.0]
    t, il, ir, si = stream[0]
    assert il.shape == (24, 32, 3) and ir.shape == (24, 32, 3)
    # intrinsics scale by (w1/w0, h1/h0, w1/w0, h1/h0)
    np.testing.assert_allclose(
        si, np.array(intr) * [32 / 64, 24 / 48, 32 / 64, 24 / 48])


def test_stereo_resize_matches_torch_align_corners(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    _write_scene(tmp_path, n=1, hw=(37, 53))
    stream = StereoStream(str(tmp_path), [1, 1, 0, 0],
                          image_size=(24, 40))
    _, il, _, _ = stream[0]
    raw = StereoStream._read(
        str(tmp_path / "image_left" / "000000.png"), None)
    ref = F.interpolate(
        torch.from_numpy(raw.astype(np.float32)).permute(2, 0, 1)[None],
        (24, 40), mode="bilinear", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(il, ref, atol=1e-3)


def test_stereo_rectification_maps(tmp_path):
    _write_scene(tmp_path, n=1, hw=(16, 16))
    h = w = 16
    # identity remap: output must equal the unmapped read
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    stream = StereoStream(str(tmp_path), [1, 1, 0, 0],
                          image_size=(16, 16),
                          map_left=(gx, gy), map_right=(gx, gy))
    _, il, ir, _ = stream[0]
    plain = StereoStream(str(tmp_path), [1, 1, 0, 0],
                         image_size=(16, 16))
    _, pl, pr, _ = plain[0]
    np.testing.assert_allclose(il, pl)
    np.testing.assert_allclose(ir, pr)


def test_image_stream_demo_path(tmp_path):
    _write_scene(tmp_path, n=3, right=False)
    stream = ImageStream(str(tmp_path / "image_left"),
                         [100.0, 100.0, 32.0, 24.0],
                         image_size=(24, 32))
    frames = list(stream)
    assert len(frames) == 3
    t, img, intr, depth = frames[0]
    assert img.shape == (24, 32, 3) and depth is None
