"""Corner detection: Shi-Tomasi (GFTT) and FAST, with local + grid NMS and
fixed-budget top-K selection.

TPU-native equivalents of the OpenCV GFTT detector used by the quad
matcher's tracking mode (reference: quadmatcher.cpp:301-308 — quality 0.04,
minDist 8; selected at track.cpp:52) and of ORB_SLAM2's grid-distributed
FAST (reference: orb.h:6,26 — ini/min thresholds 20/7; SURVEY.md §2.2 row
"ORBextractor"). Data-dependent keypoint counts become a static budget
(K slots + validity mask): dense response maps -> per-cell NMS -> global
top-K, all fixed-shape so XLA compiles one program per image size.

The reference's quadtree keypoint distribution (ORBextractor) is replaced by
grid-cell NMS, which achieves the same spatial spreading in a single
data-parallel pass instead of a sequential tree walk.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.ops import image as im


class Keypoints(NamedTuple):
    """Fixed-budget keypoint set: (K, 2) [x, y] float coords, (K,) scores,
    (K,) validity mask. Invalid slots hold coords (0, 0)."""

    xy: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray


def shi_tomasi_response(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Min-eigenvalue corner response (GFTT)."""
    ix, iy = im.gradients(img)
    ixx = im.box_blur(ix * ix, block_size)
    iyy = im.box_blur(iy * iy, block_size)
    ixy = im.box_blur(ix * iy, block_size)
    tr = ixx + iyy
    det_term = jnp.sqrt(jnp.square(ixx - iyy) + 4.0 * jnp.square(ixy))
    return 0.5 * (tr - det_term)


def harris_response(img: jnp.ndarray, block_size: int = 3,
                    k: float = 0.04) -> jnp.ndarray:
    ix, iy = im.gradients(img)
    ixx = im.box_blur(ix * ix, block_size)
    iyy = im.box_blur(iy * iy, block_size)
    ixy = im.box_blur(ix * iy, block_size)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


# FAST-16 circle offsets (dx, dy), radius 3, clockwise from 12 o'clock
_FAST_OFFSETS = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so out[y, x] = img[y + dy, x + dx] (zero padded)."""
    H, W = img.shape[-2:]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    padded = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(py1, py0), (px1, px0)])
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, py1 + dy, H, axis=-2),
        px1 + dx, W, axis=-1)


def fast_response(img: jnp.ndarray, threshold: float,
                  arc_length: int = 9) -> jnp.ndarray:
    """FAST-N corner response map (0 where not a corner).

    Segment test: a pixel is a corner iff >= ``arc_length`` contiguous circle
    pixels are all brighter than c+t or all darker than c-t. The contiguity
    check uses log-doubling ANDs over the circular neighbor axis instead of
    the reference's sequential byte tricks. Score = sum of |excess| over the
    circle (NMS ranking)."""
    neigh = jnp.stack([_shift(img, int(dy), int(dx))
                       for dx, dy in _FAST_OFFSETS])  # (16, H, W)
    d = neigh - img[None]
    bright = d > threshold
    dark = d < -threshold

    def has_arc(m: jnp.ndarray) -> jnp.ndarray:
        # AND over runs of length arc_length via log-doubling rolls
        acc = m
        run = 1
        while run * 2 <= arc_length:
            acc = acc & jnp.roll(acc, -run, axis=0)
            run *= 2
        rem = arc_length - run
        if rem > 0:
            # windows may overlap: AND is idempotent, so [i..i+run-1] AND
            # [i+rem..i+rem+run-1] covers [i..i+arc_length-1]
            acc = acc & jnp.roll(acc, -rem, axis=0)
        return jnp.any(acc, axis=0)

    is_corner = has_arc(bright) | has_arc(dark)
    excess = jnp.maximum(jnp.abs(d) - threshold, 0.0)
    score = jnp.sum(excess, axis=0)
    # suppress the 3-px border: zero-padded neighbors would fake corners
    H, W = img.shape[-2:]
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(is_corner & interior, score, 0.0)


def local_max_mask(response: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """True where response is a strict local maximum in a size x size window."""
    pooled = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME")
    return (response >= pooled) & (response > 0)


@partial(jax.jit, static_argnames=("max_corners", "cell_size"))
def select_keypoints(response: jnp.ndarray, max_corners: int,
                     quality_level: float = 0.01, cell_size: int = 16,
                     border: int = 16) -> Keypoints:
    """Response map -> fixed-budget spread-out keypoints.

    1. 3x3 local NMS;  2. keep only per-grid-cell maxima (spatial spreading,
    the reference's minDistance/quadtree role);  3. quality gate relative to
    the global max (GFTT's qualityLevel, quadmatcher.cpp:303);  4. global
    top-``max_corners``.
    """
    H, W = response.shape
    r = jnp.where(local_max_mask(response), response, 0.0)
    # border suppression (the reference's edge threshold, orb.h:24)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inside = ((ys >= border) & (ys < H - border)
              & (xs >= border) & (xs < W - border))
    r = jnp.where(inside, r, 0.0)

    # per-cell unique max: exactly one winner per grid cell (argmax one-hot
    # breaks ties deterministically — the spatial-spreading role of the
    # reference's quadtree / GFTT minDistance)
    ch = -(-H // cell_size)
    cw = -(-W // cell_size)
    padded = jnp.pad(r, ((0, ch * cell_size - H), (0, cw * cell_size - W)))
    cells = padded.reshape(ch, cell_size, cw, cell_size).transpose(0, 2, 1, 3)
    flat_cells = cells.reshape(ch, cw, cell_size * cell_size)
    winner = jax.nn.one_hot(jnp.argmax(flat_cells, axis=-1),
                            cell_size * cell_size, dtype=r.dtype)
    kept = (flat_cells * winner).reshape(ch, cw, cell_size, cell_size)
    r = kept.transpose(0, 2, 1, 3).reshape(
        ch * cell_size, cw * cell_size)[:H, :W]

    r = jnp.where(r >= quality_level * jnp.max(r), r, 0.0)

    flat = r.reshape(-1)
    score, idx = jax.lax.top_k(flat, max_corners)
    valid = score > 0
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return Keypoints(xy=xy, score=jnp.where(valid, score, 0.0), valid=valid)


def gftt(img: jnp.ndarray, max_corners: int = 500,
         quality_level: float = 0.04, min_distance: int = 8,
         block_size: int = 3) -> Keypoints:
    """Good-features-to-track with the reference's active config
    (quadmatcher.cpp:301-308): quality 0.04, minDist 8."""
    resp = shi_tomasi_response(img, block_size)
    return select_keypoints(resp, max_corners, quality_level,
                            cell_size=max(min_distance, 4), border=8)
