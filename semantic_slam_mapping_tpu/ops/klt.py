"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for ``cv::calcOpticalFlowPyrLK`` as used by the quad
matcher's circular tracking (reference: quadmatcher.cpp:548-588 — 3-level
pyramid, 11x11 window, <=20 iterations / eps 0.01, min-eigenvalue gating).
The reference tracks each feature with data-dependent early exit; here every
feature runs a fixed iteration count under `lax.scan` with a convergence
mask (SURVEY.md §7 hard-part #2), vmapped over the whole feature set — one
fused kernel instead of a per-feature scalar loop.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import KltConfig
from semantic_slam_mapping_tpu.ops import image as im


class TrackResult(NamedTuple):
    xy: jnp.ndarray       # (N, 2) tracked positions in the target image
    status: jnp.ndarray   # (N,) bool: tracked successfully
    error: jnp.ndarray    # (N,) mean |residual| over the window


def _patch_offsets(window: int) -> jnp.ndarray:
    r = window // 2
    g = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ox, oy = jnp.meshgrid(g, g, indexing="xy")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (w*w, 2)


_MARGIN = 10  # flow range captured by the local window per level (px)


def _interp_matrix(offset: jnp.ndarray, win: int, size: int) -> jnp.ndarray:
    """(win, size) bilinear row-interpolation matrix: row k carries weight
    (1-a) at floor(offset)+k and a at floor(offset)+k+1. Sampling a patch
    at a fractional 2D offset then becomes S_y @ W @ S_x^T — two small
    matmuls on the MXU instead of a scalarized gather (the reason this
    kernel is fast on TPU)."""
    i0 = jnp.floor(offset)
    a = offset - i0
    rows = jnp.arange(win, dtype=jnp.float32)[:, None]
    cols = jnp.arange(size, dtype=jnp.float32)[None, :]
    pos = i0 + rows
    return (jnp.maximum(0.0, 1.0 - jnp.abs(cols - pos)) * (1.0 - a)
            + jnp.maximum(0.0, 1.0 - jnp.abs(cols - pos - 1.0)) * a)


def _sample_patch(window: jnp.ndarray, offset: jnp.ndarray,
                  win: int) -> jnp.ndarray:
    """Bilinear (win, win) patch from a (S, S) local window at fractional
    ``offset`` (x, y) relative to the window origin."""
    S = window.shape[-1]
    Sy = _interp_matrix(offset[1], win, S)
    Sx = _interp_matrix(offset[0], win, S)
    return jnp.einsum("ks,st,lt->kl", Sy, window, Sx,
                      precision=jax.lax.Precision.HIGHEST)


_BLK = 64  # x-block granularity: two adjacent blocks cover any span <= 64


def _gather_window(img: jnp.ndarray, corner: jnp.ndarray,
                   size: int) -> jnp.ndarray:
    """Integer-aligned (size, size) window at ``corner`` (x0, y0), zero
    padded out of bounds.

    TPU layout: a 2D scalar gather of size^2 points per feature serializes
    badly, and gathering ``size`` FULL rows then selecting columns with a
    (W, size) one-hot matmul moves W/size times more HBM than the window
    itself (r5 roofline: 7.6 GB -> one KLT leg). Instead gather two
    adjacent 64-wide lane blocks per row — contiguous 256 B lines, the
    TPU-friendly gather granularity — and select columns from the 128-wide
    strip with a small one-hot matmul on the MXU. Requires size <= 64."""
    H, W = img.shape
    nb = -(-W // _BLK)
    imgb = img
    if nb * _BLK != W:
        imgb = jnp.pad(img, ((0, 0), (0, nb * _BLK - W)))
    imgb = imgb.reshape(H, nb, _BLK)
    ys = corner[1] + jnp.arange(size)
    y_ok = (ys >= 0) & (ys < H)
    ys_c = jnp.clip(ys, 0, H - 1)
    b0 = jnp.clip(jnp.floor_divide(corner[0], _BLK), 0, nb - 1)
    blocks = jnp.clip(jnp.stack([b0, b0 + 1]), 0, nb - 1)
    strip = imgb[ys_c[:, None], blocks[None, :]]    # (size, 2, 64) gather
    strip = jnp.where(y_ok[:, None, None], strip, 0.0)
    strip = strip.reshape(size, 2 * _BLK)
    off = corner[0] - b0 * _BLK                     # window start in strip
    xs = corner[0] + jnp.arange(size)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * _BLK, size), 0)
    Ex = (cols == jnp.clip(off + jnp.arange(size), 0,
                           2 * _BLK - 1)[None, :]).astype(img.dtype)
    x_ok = (xs >= 0) & (xs < W)
    w = jnp.dot(strip, Ex, preferred_element_type=jnp.float32)
    return jnp.where(x_ok[None, :], w, 0.0)


def _track_level(template: jnp.ndarray, target: jnp.ndarray,
                 pt0: jnp.ndarray, guess: jnp.ndarray,
                 cfg: KltConfig) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK for a single feature (vmapped by callers).

    pt0: (2,) position in template at this level; guess: (2,) initial
    displacement. Returns (flow (2,), ok, mean_abs_residual).

    Layout: one integer-aligned local window is gathered per image, then
    every per-iteration fractional patch sample is interpolation matmuls
    (see _interp_matrix) — no gathers inside the iteration loop."""
    win = cfg.window_size
    r = win // 2
    S = win + 2 * _MARGIN + 2
    n = win * win

    tx, ty = im.gradients(template)
    # template window corner at floor(pt0) - r - 1; the patch top-left
    # (pt0 - r) sits at fractional offset frac(pt0) + 1 inside it
    t_corner = (jnp.floor(pt0) - r - 1).astype(jnp.int32)
    t_o = pt0 - jnp.floor(pt0) + 1.0

    w_t = _gather_window(template, t_corner, win + 2)
    w_gx = _gather_window(tx, t_corner, win + 2)
    w_gy = _gather_window(ty, t_corner, win + 2)
    t_patch = _sample_patch(w_t, t_o, win)
    gx = _sample_patch(w_gx, t_o, win)
    gy = _sample_patch(w_gy, t_o, win)

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) / n
    # cfg.min_eig_threshold is in OpenCV's units — spatial-gradient matrix
    # of 8-bit [0,255] images (calcOpticalFlowPyrLK minEigThreshold=1e-6,
    # quadmatcher.cpp:566-577). These images are [0,1], so gradients^2 are
    # 255^2 smaller; without this rescale the gate was ~65000x stricter
    # than the reference and silently dropped ~60% of stereo-leg tracks.
    ok_g = min_eig > cfg.min_eig_threshold / (255.0 * 255.0)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    # target window centered at the initial guess, with +-_MARGIN play
    tgt_center = pt0 + guess
    tgt_corner = (jnp.floor(tgt_center) - r - _MARGIN).astype(jnp.int32)
    w_j = _gather_window(target, tgt_corner, S)

    def body(carry, _):
        g, converged = carry
        # patch corner offset inside the window for current flow g
        o = pt0 + g - tgt_corner.astype(jnp.float32) - r
        j_patch = _sample_patch(w_j, o, win)
        rr = j_patch - t_patch
        bx = jnp.sum(rr * gx)
        by = jnp.sum(rr * gy)
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(-gxy * bx + gxx * by) * inv_det
        step = jnp.stack([dx, dy])
        # clamp so the patch stays inside the gathered window
        new_g = jnp.clip(g + step, guess - _MARGIN + 1, guess + _MARGIN - 1)
        new_g = jnp.where(converged | ~ok_g, g, new_g)
        new_conv = converged | (jnp.sum(step * step) < cfg.epsilon ** 2)
        return (new_g, new_conv), None

    (flow, _), _ = jax.lax.scan(
        body, (guess, jnp.asarray(False)), None, length=cfg.max_iterations,
        unroll=4)

    o = pt0 + flow - tgt_corner.astype(jnp.float32) - r
    final = _sample_patch(w_j, o, win)
    err = jnp.mean(jnp.abs(final - t_patch))
    return flow, ok_g, err


@partial(jax.jit, static_argnames=("cfg",))
def track_pyramid(template_pyr: Tuple[jnp.ndarray, ...],
                  target_pyr: Tuple[jnp.ndarray, ...],
                  pts: jnp.ndarray, cfg: KltConfig = KltConfig(),
                  init: jnp.ndarray | None = None) -> TrackResult:
    """Track points from template to target through a 2x pyramid
    (finest-first tuple of images, as from ``ops.image.build_pyramid``).

    pts: (N, 2) positions in the finest template level.
    init: optional (N, 2) initial displacement (e.g. constant-velocity or
    previous stereo disparity prior; the reference seeds KLT with the
    previous points, quadmatcher.cpp:566-576).
    """
    n_levels = len(template_pyr)
    H, W = template_pyr[0].shape
    flow = (init if init is not None else jnp.zeros_like(pts))
    flow = flow / (2.0 ** (n_levels - 1))

    ok = jnp.ones(pts.shape[0], bool)
    err = jnp.zeros(pts.shape[0])
    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lvl
        pt_l = pts / scale
        f, ok_l, err = jax.vmap(
            lambda p, g: _track_level(template_pyr[lvl], target_pyr[lvl],
                                      p, g, cfg))(pt_l, flow)
        ok = ok & ok_l
        flow = f * 2.0 if lvl > 0 else f

    out = pts + flow
    inb = ((out[:, 0] >= 1) & (out[:, 0] <= W - 2)
           & (out[:, 1] >= 1) & (out[:, 1] <= H - 2))
    return TrackResult(xy=out, status=ok & inb, error=err)


def track(template: jnp.ndarray, target: jnp.ndarray, pts: jnp.ndarray,
          cfg: KltConfig = KltConfig(),
          init: jnp.ndarray | None = None) -> TrackResult:
    """Convenience wrapper: builds the 2x pyramids then tracks."""
    tp = tuple(im.build_pyramid(template, cfg.pyramid_levels, 2.0))
    gp = tuple(im.build_pyramid(target, cfg.pyramid_levels, 2.0))
    return track_pyramid(tp, gp, pts, cfg, init)
