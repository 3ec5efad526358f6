"""Dense stereo triangulation and pitch rectification.

Replaces the reference's ``triangulate10D`` (reference: src/stereo.cpp:41-118
— builds an HxWx10 float image [X, Y, Z, u, v, disp, intensity, I_u, I_v,
motion] with ROI classification) and ``correct3DPoints`` (stereo.cpp:127-181
— rotates Y/Z by the ground-plane pitch estimated from V-disparity) and
``setImageROI`` (stereo.cpp:183-192).

TPU design: instead of one 10-channel packed image, a pytree of purpose
arrays (xyz, disparity, masks) — same information, but each consumer fuses
with exactly the channels it needs and XLA keeps layouts optimal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import CameraConfig
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics, pixel_grid


class PointImage(NamedTuple):
    """Dense per-pixel stereo geometry (the triangulate10D role)."""

    xyz: jnp.ndarray        # (H, W, 3) camera-frame points
    disparity: jnp.ndarray  # (H, W) input disparity (px)
    valid: jnp.ndarray      # (H, W) disparity valid
    roi: jnp.ndarray        # (H, W) inside the 3D region of interest


def triangulate_image(K: Intrinsics, disparity: jnp.ndarray,
                      cam: CameraConfig,
                      min_disparity: float = 0.5) -> PointImage:
    """Dense disparity -> camera-frame points with ROI classification
    (|X| < roix, |Y| < roiy, 0 < Z < roiz — reference ROI3D semantics,
    basicStructure.hpp:15-38, applied at stereo.cpp:85-104)."""
    H, W = disparity.shape
    valid = disparity > min_disparity
    d = jnp.where(valid, disparity, 1.0)
    z = K.bf / d
    uv = pixel_grid(H, W, dtype=disparity.dtype)
    x = (uv[..., 0] - K.cx) * z / K.fx
    y = (uv[..., 1] - K.cy) * z / K.fy
    xyz = jnp.stack([x, y, z], axis=-1)
    xyz = jnp.where(valid[..., None], xyz, 0.0)
    roi = (valid
           & (jnp.abs(x) < cam.roix)
           & (jnp.abs(y) < cam.roiy)
           & (z > 0) & (z < cam.roiz))
    return PointImage(xyz=xyz, disparity=disparity, valid=valid, roi=roi)


def correct_pitch(points: PointImage, pitch: jnp.ndarray,
                  cam: CameraConfig) -> PointImage:
    """Rotate Y/Z about the camera x-axis by the ground pitch so the ground
    plane becomes y = const (reference: correct3DPoints, stereo.cpp:127-181
    — y' = y cos(t) - z sin(t), z' = y sin(t) + z cos(t) up to the
    reference's sign convention), then re-classify the ROI."""
    c = jnp.cos(pitch)
    s = jnp.sin(pitch)
    x = points.xyz[..., 0]
    y = points.xyz[..., 1]
    z = points.xyz[..., 2]
    y2 = c * y - s * z
    z2 = s * y + c * z
    xyz = jnp.stack([x, y2, z2], axis=-1)
    roi = (points.valid
           & (jnp.abs(x) < cam.roix)
           & (jnp.abs(y2) < cam.roiy)
           & (z2 > 0) & (z2 < cam.roiz))
    return PointImage(xyz=xyz, disparity=points.disparity,
                      valid=points.valid, roi=roi)
