"""TUM RGB-D dataset reader.

Replaces the reference's ``FrameReader`` TUM path (reference:
rgbdframe.cpp:199-227 — parses ``associate.txt`` of
``rgb_time rgb_file depth_time depth_file`` rows; depth PNGs are 16-bit with
depth = value / camera.scale).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from semantic_slam_mapping_tpu.io.frame import StereoFrame


def parse_associate(text: str) -> List[Tuple[float, str, float, str]]:
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) < 4:
            continue
        out.append((float(parts[0]), parts[1], float(parts[2]), parts[3]))
    return out


class TumReader:
    """RGB-D frame source over a TUM sequence with an associate.txt."""

    def __init__(self, root: str, depth_scale: float = 5000.0,
                 associate_file: str = "associate.txt",
                 start_index: int = 0, end_index: Optional[int] = None):
        self.root = Path(root)
        self.depth_scale = depth_scale
        assoc_path = self.root / associate_file
        if not assoc_path.is_file():
            raise FileNotFoundError(f"no associate file: {assoc_path}")
        self.pairs = parse_associate(assoc_path.read_text())
        self.start = start_index
        self.end = min(end_index, len(self.pairs)) if end_index else len(self.pairs)
        self.timestamps = [p[0] for p in self.pairs]

    def __len__(self) -> int:
        return self.end - self.start

    def get(self, index: int) -> StereoFrame:
        from PIL import Image
        _, rgb_file, _, depth_file = self.pairs[index]
        with Image.open(self.root / rgb_file) as im:
            color = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
        gray = (0.299 * color[..., 0] + 0.587 * color[..., 1]
                + 0.114 * color[..., 2]).astype(np.float32)
        with Image.open(self.root / depth_file) as im:
            raw = np.asarray(im, dtype=np.float32)
        depth = raw / self.depth_scale
        # monocular RGB-D: no right image; right=left placeholder keeps the
        # frame shape uniform (the RGB-D tracking path never reads it)
        return StereoFrame(left=gray, right=gray, index=index, color=color,
                           depth=depth)

    def __iter__(self) -> Iterator[StereoFrame]:
        for i in range(self.start, self.end):
            yield self.get(i)
