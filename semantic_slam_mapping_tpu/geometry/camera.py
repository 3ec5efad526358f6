"""Pinhole + stereo camera model as pure jnp functions.

Covers the reference's projection/backprojection spread across
``RGBDFrame::project2dTo3d`` (reference: rgbdframe.h:63-75), the depth
conversion loop (rgbdframe.cpp:96-116), the stereo projection model inside
the VO Jacobians (vo_stereo.cpp:275-365), and ``triangulate10D``
(stereo.cpp:41-118). Everything is batched: points are (…, N, k) arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import CameraConfig


class Intrinsics(NamedTuple):
    """Device-side camera intrinsics (a small pytree usable under jit)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    baseline: jnp.ndarray
    scale: jnp.ndarray

    @classmethod
    def from_config(cls, cam: CameraConfig, dtype=jnp.float32) -> "Intrinsics":
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(f(cam.fx), f(cam.fy), f(cam.cx), f(cam.cy),
                   f(cam.baseline), f(cam.scale))

    @property
    def bf(self) -> jnp.ndarray:
        return self.fx * self.baseline


def project(K: Intrinsics, pts: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points (…, 3) -> pixel coords (…, 2) [u, v]."""
    z = pts[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K.fx * pts[..., 0] * inv_z + K.cx
    v = K.fy * pts[..., 1] * inv_z + K.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(K: Intrinsics, pts: jnp.ndarray) -> jnp.ndarray:
    """3D points (…, 3) -> (…, 4) [u_l, v_l, u_r, v_r] stereo observation
    (the 4-D observation used by the VO reprojection error,
    vo_stereo.cpp:158-176)."""
    z = pts[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u_l = K.fx * pts[..., 0] * inv_z + K.cx
    v = K.fy * pts[..., 1] * inv_z + K.cy
    u_r = K.fx * (pts[..., 0] - K.baseline) * inv_z + K.cx
    return jnp.stack([u_l, v, u_r, v], axis=-1)


def backproject(K: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (…, 2) + metric depth (…,) -> camera-frame 3D (…, 3)
    (reference: rgbdframe.h:63-75 project2dTo3d, which divides raw depth by
    camera.scale — here depth is already metric)."""
    x = (uv[..., 0] - K.cx) * depth / K.fx
    y = (uv[..., 1] - K.cy) * depth / K.fy
    return jnp.stack([x, y, depth], axis=-1)


def disparity_to_depth(K: Intrinsics, disparity: jnp.ndarray,
                       min_disparity: float = 0.5) -> jnp.ndarray:
    """Stereo disparity (px) -> metric depth; invalid (<= min) -> 0
    (reference: rgbdframe.cpp:96-116 converts d -> bf/d with ROI gating)."""
    valid = disparity > min_disparity
    depth = K.bf / jnp.where(valid, disparity, 1.0)
    return jnp.where(valid, depth, 0.0)


def triangulate_stereo(K: Intrinsics, uv_left: jnp.ndarray,
                       disparity: jnp.ndarray) -> jnp.ndarray:
    """Left-pixel (…, 2) + disparity (…,) -> camera-frame 3D (…, 3)
    (the per-match triangulation of vo_stereo.cpp:75-80)."""
    d = jnp.maximum(disparity, 1e-6)
    z = K.bf / d
    x = (uv_left[..., 0] - K.cx) * z / K.fx
    y = (uv_left[..., 1] - K.cy) * z / K.fy
    return jnp.stack([x, y, z], axis=-1)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) [u, v] pixel-coordinate image."""
    v = jnp.arange(height, dtype=dtype)[:, None]
    u = jnp.arange(width, dtype=dtype)[None, :]
    uu = jnp.broadcast_to(u, (height, width))
    vv = jnp.broadcast_to(v, (height, width))
    return jnp.stack([uu, vv], axis=-1)


def backproject_image(K: Intrinsics, depth: jnp.ndarray) -> jnp.ndarray:
    """Dense depth image (H, W) -> camera-frame point image (H, W, 3)
    (vectorizes mapper.cpp:22-86's per-pixel loop)."""
    H, W = depth.shape
    uv = pixel_grid(H, W, dtype=depth.dtype)
    return backproject(K, uv, depth)
