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


def _track_level(template: jnp.ndarray, target: jnp.ndarray,
                 pt0: jnp.ndarray, guess: jnp.ndarray,
                 cfg: KltConfig) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK for a single feature.

    pt0: (2,) position in template at this level; guess: (2,) initial
    displacement. Returns (flow (2,), ok, mean_abs_residual)."""
    offs = _patch_offsets(cfg.window_size)           # (P, 2)
    n = offs.shape[0]

    tx, ty = im.gradients(template)
    base = pt0[None, :] + offs                        # (P, 2)
    t_patch = im.bilinear_sample(template, base)
    gx = im.bilinear_sample(tx, base)
    gy = im.bilinear_sample(ty, base)

    # 2x2 structure tensor (the spatial gradient matrix G)
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))) / n
    ok_g = min_eig > cfg.min_eig_threshold
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    def body(carry, _):
        g, converged = carry
        cur = base + g[None, :]
        j_patch = im.bilinear_sample(target, cur)
        r = j_patch - t_patch
        bx = jnp.sum(r * gx)
        by = jnp.sum(r * gy)
        # delta = -G^-1 b
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(-gxy * bx + gxx * by) * inv_det
        step = jnp.stack([dx, dy])
        new_g = jnp.where(converged | ~ok_g, g, g + step)
        new_conv = converged | (jnp.sum(step * step) < cfg.epsilon ** 2)
        return (new_g, new_conv), None

    (flow, _), _ = jax.lax.scan(
        body, (guess, jnp.asarray(False)), None, length=cfg.max_iterations)

    final = im.bilinear_sample(target, base + flow[None, :])
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
