"""Trajectory plotting — estimated vs ground-truth top-down overlay.

The numeric ATE/RPE harness (utils/metrics.py) is the primary accuracy
report; this is the visual counterpart of the reference's canvas plots
(reference: experiment/run_tracker.cpp:50-63 and experiment/test_pnp.cpp:
61-74 — cv::circle of (x, z) onto a 1500x1500 cv::Mat). Pure numpy + PIL,
host-side, out of the hot path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def plot_trajectories(path: str | Path, est: np.ndarray,
                      gt: Optional[np.ndarray] = None,
                      size: int = 1500, margin: int = 60) -> None:
    """Write a top-down (x, z) trajectory PNG. ``est``/``gt`` are (N, 4, 4)
    camera-to-world pose arrays; estimated is drawn green, GT red (the
    reference's color choice, run_tracker.cpp:55-62)."""
    from PIL import Image, ImageDraw

    tracks = [(np.asarray(est), (40, 200, 60))]
    if gt is not None and len(gt):
        tracks.append((np.asarray(gt), (220, 50, 50)))

    pts = np.concatenate([t[:, [0, 2], 3] for t, _ in tracks])
    lo, hi = pts.min(0), pts.max(0)
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-6))
    s = (size - 2 * margin) / span

    def to_px(xz: np.ndarray) -> Sequence[tuple]:
        u = margin + (xz[:, 0] - lo[0]) * s
        v = size - margin - (xz[:, 1] - lo[1]) * s  # +z up on the canvas
        return list(zip(u.tolist(), v.tolist()))

    img = Image.new("RGB", (size, size), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    for poses, color in reversed(tracks):  # GT under the estimate
        px = to_px(poses[:, [0, 2], 3])
        if len(px) > 1:
            draw.line(px, fill=color, width=2)
        for p in px[:: max(1, len(px) // 300)]:
            draw.ellipse([p[0] - 2, p[1] - 2, p[0] + 2, p[1] + 2],
                         fill=color)
    draw.text((margin, margin // 2),
              "green: estimated" + ("   red: ground truth" if gt is not None
                                    else ""), fill=(0, 0, 0))
    img.save(str(path))
