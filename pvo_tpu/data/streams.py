"""Stream readers and dataset factory.

Rebuild of reference VO_Module/droid_slam/data_readers/stream.py,
tartan.py, replica.py and factory.py: simple iterator-based readers for
demo/eval streams, TUM-format pose loaders (rgbd_utils.py:38-92), and a
dataset factory concatenating training datasets.
"""

from __future__ import annotations

import glob
import os.path as osp

import numpy as np


def parse_list(filepath, skiprows=0):
    return np.loadtxt(filepath, delimiter=" ", dtype=np.unicode_,
                      skiprows=skiprows)


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose,
                     max_dt=0.08):
    """TUM timestamp association (reference rgbd_utils.py:56-76)."""
    associations = []
    for i, t in enumerate(tstamp_image):
        if tstamp_pose is None:
            j = np.argmin(np.abs(tstamp_depth - t))
            if np.abs(tstamp_depth[j] - t) < max_dt:
                associations.append((i, j))
        else:
            j = np.argmin(np.abs(tstamp_depth - t))
            k = np.argmin(np.abs(tstamp_pose - t))
            if (np.abs(tstamp_depth[j] - t) < max_dt and
                    np.abs(tstamp_pose[k] - t) < max_dt):
                associations.append((i, j, k))
    return associations


def load_tum_poses(pose_file):
    """TUM trajectory: t tx ty tz qx qy qz qw -> (T,) stamps, (T,7)."""
    data = np.loadtxt(pose_file, delimiter=" ", comments="#")
    return data[:, 0], data[:, 1:8].astype(np.float32)


class ImageStream:
    """Image-directory stream (reference stream.py RGBStream)."""

    def __init__(self, imagedir, intrinsics, stride=1, image_size=None):
        self.files = sorted(
            glob.glob(osp.join(imagedir, "*.png")) +
            glob.glob(osp.join(imagedir, "*.jpg")))[::stride]
        self.intrinsics = np.asarray(intrinsics, np.float32)
        self.image_size = image_size

    def __len__(self):
        return len(self.files)

    def __iter__(self):
        import cv2
        for t, f in enumerate(self.files):
            img = cv2.imread(f)
            intr = self.intrinsics.copy()
            if self.image_size is not None:
                h1, w1 = self.image_size
                h0, w0 = img.shape[:2]
                img = cv2.resize(img, (w1, h1))
                intr *= np.array([w1 / w0, h1 / h0, w1 / w0, h1 / h0],
                                 np.float32)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = img[: img.shape[0] // 8 * 8, : img.shape[1] // 8 * 8]
            yield t, img, intr, None


class RGBDStream(ImageStream):
    """Image + depth stream (reference stream.py RGBDStream)."""

    def __init__(self, imagedir, depthdir, intrinsics, stride=1,
                 depth_scale=1000.0, **kw):
        super().__init__(imagedir, intrinsics, stride, **kw)
        self.depth_files = sorted(
            glob.glob(osp.join(depthdir, "*.png")))[::stride]
        self.depth_scale = depth_scale

    def __iter__(self):
        import cv2
        for (t, img, intr, _), df in zip(super().__iter__(),
                                         self.depth_files):
            d = cv2.imread(df, cv2.IMREAD_ANYDEPTH)
            yield t, img, intr, d.astype(np.float32) / self.depth_scale


def dataset_factory(names, **kwargs):
    """Concatenate training datasets by name (reference
    factory.py:19-35). Currently: vkitti2 (the PVO training set);
    tartan/replica hooks are registered for parity and raise until
    their data layouts are provided."""
    datasets = []
    for name in names:
        if name == "vkitti2":
            from .vkitti2 import VKitti2Dataset
            datasets.append(VKitti2Dataset(**kwargs))
        elif name == "tartan":
            from .tartan import TartanAirDataset
            datasets.append(TartanAirDataset(**kwargs))
        elif name == "replica":
            from .tartan import ReplicaDataset
            datasets.append(ReplicaDataset(**kwargs))
        else:
            raise ValueError(f"unknown dataset {name}")
    if len(datasets) == 1:
        return datasets[0]

    class Concat:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return sum(len(d) for d in self.ds)

        def sample_clip(self):
            i = np.random.randint(len(self.ds))
            return self.ds[i].sample_clip()

    return Concat(datasets)
