"""Circular (quad) feature matching across the stereo pair x two frames.

Replaces the reference's ``QuadFeatureMatch`` tracking mode (reference:
src/quadmatcher.cpp:548-588 — GFTT detection then pyramidal-KLT chain
lc -> rc -> rp -> lp plus a direct lc -> lp track, with the chain accepted
only if it closes on the direct track within 1 px; geometric gates in
``filteringTracks``, quadmatcher.cpp:420-503: epipolar |dy| bound, minimum
disparity, flow bound). The descriptor-matching mode's detector zoo
(quadmatcher.cpp:219-362) is intentionally reduced to ORB elsewhere —
SURVEY.md §2.2 records the decision.

TPU design: one jitted program — GFTT once, four batched KLT legs over the
same fixed feature budget, all gates as vectorized masks. The stereo legs
can be seeded with SGBM disparity when available (the reference leaves KLT
unseeded and relies on the pyramid; seeding recovers large near-field
disparities the pyramid alone cannot)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import (GfttConfig, KltConfig,
                                              QuadMatchConfig)
from semantic_slam_mapping_tpu.frontend.vo import QuadMatches
from semantic_slam_mapping_tpu.ops import corners
from semantic_slam_mapping_tpu.ops import image as im
from semantic_slam_mapping_tpu.ops import klt


@partial(jax.jit, static_argnames=("qcfg", "gcfg", "kcfg"))
def quad_match(cur_left: jnp.ndarray, cur_right: jnp.ndarray,
               prev_left: jnp.ndarray, prev_right: jnp.ndarray,
               qcfg: QuadMatchConfig = QuadMatchConfig(),
               gcfg: GfttConfig = GfttConfig(),
               kcfg: KltConfig = KltConfig(),
               cur_disparity: Optional[jnp.ndarray] = None,
               flow_prior: Optional[jnp.ndarray] = None) -> QuadMatches:
    """Detect in the current left image and track the circle
    lc -> rc -> rp -> lp (+ direct lc -> lp consistency check).

    cur_disparity: optional (H, W) SGBM disparity of the current pair, used
      to seed the stereo leg.
    flow_prior: optional (2,) constant-velocity image-flow prior seeding the
      temporal legs (the tracker's motion prediction role, track.cpp:41).
    """
    kp = corners.gftt(cur_left, max_corners=qcfg.max_features,
                      quality_level=gcfg.quality_level,
                      min_distance=gcfg.min_distance,
                      block_size=gcfg.block_size)
    lc = kp.xy

    pyr = {name: tuple(im.build_pyramid(img_, kcfg.pyramid_levels, 2.0))
           for name, img_ in (("lc", cur_left), ("rc", cur_right),
                              ("lp", prev_left), ("rp", prev_right))}

    # stereo seed: negative disparity moves x left
    if cur_disparity is not None:
        d0 = im.bilinear_sample(cur_disparity, lc)
        d0 = jnp.maximum(d0, 0.0)
        stereo_init = jnp.stack([-d0, jnp.zeros_like(d0)], axis=-1)
    else:
        stereo_init = None
    t_init = (jnp.broadcast_to(flow_prior, lc.shape)
              if flow_prior is not None else None)

    leg_rc = klt.track_pyramid(pyr["lc"], pyr["rc"], lc, kcfg, stereo_init)
    leg_rp = klt.track_pyramid(pyr["rc"], pyr["rp"], leg_rc.xy, kcfg, t_init)
    leg_lp = klt.track_pyramid(pyr["rp"], pyr["lp"], leg_rp.xy, kcfg)
    direct_lp = klt.track_pyramid(pyr["lc"], pyr["lp"], lc, kcfg, t_init)

    rc, rp, lp, lp2 = leg_rc.xy, leg_rp.xy, leg_lp.xy, direct_lp.xy

    tracked = (kp.valid & leg_rc.status & leg_rp.status
               & leg_lp.status & direct_lp.status)

    # ---- geometric gates (filteringTracks, quadmatcher.cpp:435-482) ----
    dy_c = jnp.abs(lc[:, 1] - rc[:, 1])        # dif_height1
    dy_p = jnp.abs(lp[:, 1] - rp[:, 1])        # dif_height2
    dy_l = jnp.abs(lc[:, 1] - lp[:, 1])        # dif_height11
    dy_r = jnp.abs(rc[:, 1] - rp[:, 1])        # dif_height22
    dx_l = jnp.abs(lc[:, 0] - lp[:, 0])        # dif_width1
    dx_r = jnp.abs(rc[:, 0] - rp[:, 0])        # dif_width2
    disp_c = lc[:, 0] - rc[:, 0]               # disparity1
    disp_p = lp[:, 0] - rp[:, 0]               # disparity2
    closure = jnp.linalg.norm(lp - lp2, axis=-1)

    valid = (tracked
             & (dy_c < qcfg.max_dy_stereo)
             & (dy_p < qcfg.max_dy_stereo)
             & (dy_l < qcfg.max_dy_temporal)
             & (dy_r < qcfg.max_dy_temporal)
             & (dx_l < qcfg.max_dx_temporal)
             & (dx_r < qcfg.max_dx_temporal)
             & (disp_c > qcfg.min_disparity)
             & (disp_p > qcfg.min_disparity)
             & (closure < qcfg.loop_consistency_px))

    return QuadMatches(lp=lp, rp=rp, lc=lc, rc=rc, valid=valid)
