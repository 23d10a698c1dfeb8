"""Dataset readers: EuRoC / TUM-VI (ASL format), KITTI odometry folders.

Replaces the reference's rosbag replay path (main.cpp:203-232): the node
reads a dataset directory directly, giving deterministic sequential
processing. Each reader yields dicts:
  {t, image (H,W) float, image_right or None, imu: [(t, acc3, gyro3), ...]}
with IMU samples in (t_prev, t].
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Iterator, List, Optional

import numpy as np


def _read_image(path: str) -> np.ndarray:
    import imageio.v2 as iio
    img = np.asarray(iio.imread(path))
    if img.ndim == 3:
        img = img.mean(-1)
    return img.astype(np.float32)


class EurocReader:
    """ASL folder format: mav0/cam0/data.csv + data/, mav0/imu0/data.csv.
    Also covers TUM-VI which ships the same layout."""

    def __init__(self, root: str, stereo: bool = False, use_imu: bool = False,
                 start: int = 0, end: Optional[int] = None):
        self.root = root
        cam0 = os.path.join(root, "mav0", "cam0")
        self.images = self._read_cam_csv(os.path.join(cam0, "data.csv"),
                                         os.path.join(cam0, "data"))
        self.images = self.images[start:end]
        self.stereo = stereo
        if stereo:
            cam1 = os.path.join(root, "mav0", "cam1")
            self.images_r = dict(self._read_cam_csv(
                os.path.join(cam1, "data.csv"), os.path.join(cam1, "data")))
        self.imu: List = []
        if use_imu:
            p = os.path.join(root, "mav0", "imu0", "data.csv")
            with open(p) as f:
                for row in csv.reader(f):
                    if row[0].startswith("#"):
                        continue
                    t = float(row[0]) * 1e-9
                    g = np.array(row[1:4], np.float32)
                    a = np.array(row[4:7], np.float32)
                    self.imu.append((t, a, g))

    @staticmethod
    def _read_cam_csv(csv_path, data_dir):
        out = []
        with open(csv_path) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                t = float(row[0]) * 1e-9
                out.append((t, os.path.join(data_dir, row[1].strip())))
        return out

    def __len__(self):
        return len(self.images)

    def __iter__(self) -> Iterator[dict]:
        imu_i = 0
        t_prev = -np.inf
        for t, path in self.images:
            samples = []
            while imu_i < len(self.imu) and self.imu[imu_i][0] <= t:
                if self.imu[imu_i][0] > t_prev:
                    samples.append(self.imu[imu_i])
                imu_i += 1
            rec = dict(t=t, image=_read_image(path), imu=samples,
                       image_right=None)
            if self.stereo:
                # nearest-timestamp right image (ApproximateTime sync)
                key = min(self.images_r.keys(), key=lambda k: abs(k - t)) \
                    if self.images_r else None
                if key is not None and abs(key - t) < 0.01:
                    rec["image_right"] = _read_image(self.images_r[key])
            t_prev = t
            yield rec


class KittiReader:
    """KITTI odometry: sequences/NN/image_0/*.png + times.txt."""

    def __init__(self, seq_dir: str, stereo: bool = True, start: int = 0,
                 end: Optional[int] = None):
        self.left = sorted(glob.glob(os.path.join(seq_dir, "image_0", "*.png")))
        self.right = sorted(glob.glob(os.path.join(seq_dir, "image_1", "*.png")))
        times_f = os.path.join(seq_dir, "times.txt")
        self.times = np.loadtxt(times_f) if os.path.exists(times_f) \
            else np.arange(len(self.left)) * 0.1
        self.stereo = stereo and len(self.right) == len(self.left)
        sl = slice(start, end)
        self.left = self.left[sl]
        self.right = self.right[sl] if self.stereo else []
        self.times = self.times[sl]

    def __len__(self):
        return len(self.left)

    def __iter__(self) -> Iterator[dict]:
        for i, path in enumerate(self.left):
            yield dict(
                t=float(self.times[i]), image=_read_image(path), imu=[],
                image_right=_read_image(self.right[i]) if self.stereo else None,
            )
