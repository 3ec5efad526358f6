"""KITTI stereo odometry dataset reader.

Host-side I/O replacing the reference's ``FrameReader`` KITTI path
(reference: rgbdframe.cpp:229-265 — directory scan + ``%06d.png`` naming;
``next()`` loads left/right current+previous grayscale plus color at
rgbdframe.cpp:64-78). Unlike the reference, decoding is decoupled from
compute: this module only produces numpy arrays; SGBM/depth run on device
(the reference runs SGBM inside the reader at rgbdframe.cpp:80-116).

Layout expected (standard KITTI odometry):
  <root>/image_0/%06d.png   left grayscale
  <root>/image_1/%06d.png   right grayscale
  <root>/image_2/%06d.png   left color (optional, for mapping)
  and optionally precomputed semantic label images (the reference's
  segnet_0/ + result_0/ offline pre-pass, rgbdframe.cpp:138-180).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from semantic_slam_mapping_tpu.io.frame import StereoFrame


def _load_gray(path: Path) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.float32) / 255.0


def _load_color(path: Path) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def _load_label(path: Path) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.int32)


class KittiReader:
    """Indexable frame source over a KITTI odometry sequence directory."""

    def __init__(self, root: str, start_index: int = 0,
                 end_index: Optional[int] = None,
                 left_dir: str = "image_0", right_dir: str = "image_1",
                 color_dir: str = "image_2",
                 semantic_dir: Optional[str] = None):
        self.root = Path(root)
        self.left_dir = self.root / left_dir
        self.right_dir = self.root / right_dir
        self.color_dir = self.root / color_dir
        self.semantic_dir = self.root / semantic_dir if semantic_dir else None
        if not self.left_dir.is_dir():
            raise FileNotFoundError(f"no left image dir: {self.left_dir}")
        # dir scan as in rgbdframe.cpp:229-265
        n = len([f for f in os.listdir(self.left_dir) if f.endswith(".png")])
        self.start = start_index
        self.end = min(end_index, n) if end_index is not None else n
        if self.start >= self.end:
            raise ValueError(f"empty frame range [{self.start}, {self.end})")

    def __len__(self) -> int:
        return self.end - self.start

    def get(self, index: int) -> StereoFrame:
        """Load frame by absolute dataset index (``%06d.png`` naming)."""
        name = f"{index:06d}.png"
        left = _load_gray(self.left_dir / name)
        right = _load_gray(self.right_dir / name)
        color = (_load_color(self.color_dir / name)
                 if self.color_dir.is_dir() else None)
        semantic = (_load_label(self.semantic_dir / name)
                    if self.semantic_dir and self.semantic_dir.is_dir()
                    else None)
        return StereoFrame(left=left, right=right, index=index,
                           color=color, semantic=semantic)

    def __iter__(self) -> Iterator[StereoFrame]:
        for i in range(self.start, self.end):
            yield self.get(i)
