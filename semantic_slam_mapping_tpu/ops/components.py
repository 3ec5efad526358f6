"""Connected-component labelling on grids (shared by SGBM speckle filter,
U-V-disparity flood-fill segmentation, and mapper mask fusion).

Replaces the reference's sequential cv::floodFill (reference:
uvdisparity.cpp:590) and OpenCV filterSpeckles with fixed-iteration
data-parallel label propagation + pointer jumping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(valid: jnp.ndarray,
                         same: tuple[jnp.ndarray, jnp.ndarray,
                                     jnp.ndarray, jnp.ndarray],
                         sweeps: int = 16) -> jnp.ndarray:
    """Generic 4-connected component labelling on a grid.

    ``same`` gives, for each of the 4 directions (up, down, left, right),
    whether each pixel is connected to that neighbour. Returns (H, W) int32
    labels = min flat pixel index of the component. Invalid pixels keep
    their own index and never merge.

    Algorithm: alternating min-label hooking (1-step spatial propagation)
    and pointer jumping (label <- label[label], path compression). Because
    labels are pixel indices, dereferencing a label jumps to wherever that
    minimum was discovered — so reach grows geometrically and ``sweeps`` =
    16 converges for any component that fits on the image. This replaces
    the reference's sequential cv::floodFill (uvdisparity.cpp:590) and
    OpenCV filterSpeckles with a fixed-iteration data-parallel form."""
    H, W = valid.shape
    N = H * W
    idx = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    up_ok, dn_ok, lf_ok, rt_ok = same
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    up_ok = up_ok & (row > 0) & valid
    dn_ok = dn_ok & (row < H - 1) & valid
    lf_ok = lf_ok & (col > 0) & valid
    rt_ok = rt_ok & (col < W - 1) & valid

    def hook(lbl):
        nb = jnp.minimum(
            jnp.minimum(jnp.where(up_ok, jnp.roll(lbl, 1, 0), N),
                        jnp.where(dn_ok, jnp.roll(lbl, -1, 0), N)),
            jnp.minimum(jnp.where(lf_ok, jnp.roll(lbl, 1, 1), N),
                        jnp.where(rt_ok, jnp.roll(lbl, -1, 1), N)))
        return jnp.minimum(lbl, nb)

    def body(lbl, _):
        # two roll-based hooks (cheap vector ops) per one pointer jump
        # (a 470k-element random gather — the expensive part on TPU):
        # reach still grows geometrically, at half the gather count
        lbl = hook(hook(lbl))
        flat = lbl.reshape(-1)
        flat = flat[flat]          # pointer jump: path compression
        return flat.reshape(H, W), None

    lbl, _ = jax.lax.scan(body, idx, None, length=sweeps)
    return lbl
