"""Pure-pytree frame containers.

Deliberately unlike the reference's god-object ``RGBDFrame`` (reference:
rgbdframe.h:26-121, which owns images, features, BoW vectors, the point
cloud, a mutex-guarded pose, and even the SegNet classifier handle — see
SURVEY.md §1 layering note). Here a frame is immutable raw sensor data;
derived products (features, disparity, masks, poses) are produced and owned
by the subsystems that compute them and travel alongside in explicit
structures.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class StereoFrame(NamedTuple):
    """One stereo frame: raw data only, fixed shapes, jit-friendly.

    Grayscale images are float32 in [0, 1], shape (H, W). ``index`` is the
    dataset frame id (static metadata, not traced).
    """

    left: jnp.ndarray
    right: jnp.ndarray
    index: int = 0
    # Optional color for mapping (H, W, 3) float32 [0,1]
    color: Optional[jnp.ndarray] = None
    # Optional precomputed semantic label image (H, W) int32, -1 = none
    semantic: Optional[jnp.ndarray] = None
    # Optional metric depth (TUM RGB-D path; KITTI derives it from SGBM)
    depth: Optional[jnp.ndarray] = None


class FramePair(NamedTuple):
    """The quad-matching working set: current + previous stereo frames
    (the reference's img_lc/img_rc/img_lp/img_rp, rgbdframe.h:37-44)."""

    current: StereoFrame
    previous: StereoFrame
