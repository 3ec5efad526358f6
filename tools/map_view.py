#!/usr/bin/env python
"""Offline map inspection: PCD -> orthographic PNG projections.

The stand-in for the reference's live PCL CloudViewer loop
(reference: src/mapper.cpp:159 `viewer.showCloud`) in a headless TPU
deployment: render the saved voxel map (mapper.save_pcd / the native
voxel_map.cpp PCD writer) as top-down (x-z) and side (z-y) orthographic
projections, colored by the stored point color, nearest-point-wins along
the projection axis.

    python tools/map_view.py out/map.pcd [-o out/map.png] [--px 0.1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def read_pcd(path: str):
    """Read a PCD v0.7 file with FIELDS x y z rgb (the layouts written by
    mapping/mapper.py:write_pcd and native/voxel_map.cpp). Returns
    (xyz (N,3) f32, rgb (N,3) u8)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            if line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        fields = header.get("FIELDS", "").split()
        n = int(header.get("POINTS", header.get("WIDTH", "0")))
        if fields[:4] != ["x", "y", "z", "rgb"]:
            raise ValueError(f"unsupported PCD fields {fields}")
        if header["DATA"] == "binary":
            data = np.frombuffer(f.read(n * 16), np.float32).reshape(n, 4)
        else:
            data = np.loadtxt(f, dtype=np.float32,
                              max_rows=n).reshape(n, 4)
    xyz = data[:, :3].copy()
    packed = data[:, 3].view(np.uint32)
    rgb = np.stack([(packed >> 16) & 0xFF, (packed >> 8) & 0xFF,
                    packed & 0xFF], axis=-1).astype(np.uint8)
    return xyz, rgb


def _ortho(xyz, rgb, ax_u, ax_v, ax_depth, flip_v, px):
    """Orthographic projection: image axes (u,v) from point axes, nearest
    (smallest depth-axis value after sort) wins per pixel."""
    u = xyz[:, ax_u]
    v = xyz[:, ax_v] * (-1.0 if flip_v else 1.0)
    lo_u, hi_u = np.percentile(u, [0.5, 99.5])
    lo_v, hi_v = np.percentile(v, [0.5, 99.5])
    W = max(int(np.ceil((hi_u - lo_u) / px)) + 1, 8)
    H = max(int(np.ceil((hi_v - lo_v) / px)) + 1, 8)
    iu = np.clip(((u - lo_u) / px).astype(np.int64), 0, W - 1)
    iv = np.clip(((hi_v - v) / px).astype(np.int64), 0, H - 1)
    flat = iv * W + iu
    # sort by depth DESCENDING so the nearest point writes last
    order = np.argsort(-xyz[:, ax_depth], kind="stable")
    img = np.zeros((H * W, 3), np.uint8)
    img[flat[order]] = rgb[order]
    return img.reshape(H, W, 3)


def render(xyz, rgb, px: float = 0.1):
    """(top-down x/z image, side z/y image). Camera convention is KITTI's:
    x right, y DOWN, z forward — so top-down drops y and side view flips y."""
    top = _ortho(xyz, rgb, ax_u=0, ax_v=2, ax_depth=1, flip_v=False, px=px)
    side = _ortho(xyz, rgb, ax_u=2, ax_v=1, ax_depth=0, flip_v=True, px=px)
    return top, side


def save_png(path: str, top: np.ndarray, side: np.ndarray):
    from PIL import Image
    W = max(top.shape[1], side.shape[1])
    gap = 8
    canvas = np.zeros((top.shape[0] + gap + side.shape[0], W, 3), np.uint8)
    canvas[:top.shape[0], :top.shape[1]] = top
    canvas[top.shape[0] + gap:, :side.shape[1]] = side
    Image.fromarray(canvas).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pcd")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--px", type=float, default=0.1,
                    help="meters per pixel (default = the reference's "
                         "mapper_resolution 0.1, parameters.txt:97)")
    args = ap.parse_args()
    xyz, rgb = read_pcd(args.pcd)
    top, side = render(xyz, rgb, args.px)
    out = args.out or str(Path(args.pcd).with_suffix(".png"))
    save_png(out, top, side)
    print(f"{len(xyz)} points -> {out} "
          f"(top {top.shape[1]}x{top.shape[0]}, "
          f"side {side.shape[1]}x{side.shape[0]})", file=sys.stderr)


if __name__ == "__main__":
    main()
