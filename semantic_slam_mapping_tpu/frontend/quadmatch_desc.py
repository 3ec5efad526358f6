"""Descriptor-based circular (quad) matching.

The reference's second QuadFeatureMatch mode (``mode_track=false``): detect
+ describe in all four images, then chain window-constrained brute-force
nearest neighbours lc -> rc -> rp -> lp and accept only chains that close
back on the starting feature (reference: quadmatcher.cpp:591-661 circular
index chaining; :41-83 search-window NN). The reference's detector zoo is
reduced to ORB (SURVEY.md §2.2 decision); the matcher itself is exact.

TPU design: four ORB extractions (batched internally), then three
windowed Hamming-argmin passes (MXU matmuls, ops/matching.py) plus one
closure comparison — index chaining is pure gather arithmetic on fixed
feature budgets.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import OrbConfig, QuadMatchConfig
from semantic_slam_mapping_tpu.frontend.vo import QuadMatches
from semantic_slam_mapping_tpu.ops import matching, orb


@partial(jax.jit, static_argnames=("qcfg", "ocfg"))
def quad_match_desc(cur_left: jnp.ndarray, cur_right: jnp.ndarray,
                    prev_left: jnp.ndarray, prev_right: jnp.ndarray,
                    qcfg: QuadMatchConfig = QuadMatchConfig(),
                    ocfg: OrbConfig = OrbConfig()) -> QuadMatches:
    """ORB-descriptor circular matching across the 4 views."""
    f_lc = orb.extract(cur_left, ocfg)
    f_rc = orb.extract(cur_right, ocfg)
    f_rp = orb.extract(prev_right, ocfg)
    f_lp = orb.extract(prev_left, ocfg)

    flow = qcfg.max_dx_temporal
    # stereo legs: epipolar window (wide x, tight y); temporal legs: square
    m1 = matching.windowed_match(f_lc.desc, f_lc.xy, f_rc.desc, f_rc.xy,
                                 f_lc.valid, f_rc.valid,
                                 du=256.0, dv=qcfg.max_dy_stereo + 1.0)
    m2 = matching.windowed_match(f_rc.desc, f_rc.xy, f_rp.desc, f_rp.xy,
                                 f_rc.valid, f_rp.valid, du=flow, dv=flow)
    m3 = matching.windowed_match(f_rp.desc, f_rp.xy, f_lp.desc, f_lp.xy,
                                 f_rp.valid, f_lp.valid,
                                 du=256.0, dv=qcfg.max_dy_stereo + 1.0)
    m4 = matching.windowed_match(f_lp.desc, f_lp.xy, f_lc.desc, f_lc.xy,
                                 f_lp.valid, f_lc.valid, du=flow, dv=flow)

    n = f_lc.xy.shape[0]
    idx0 = jnp.arange(n)
    i_rc = jnp.clip(m1.idx, 0, n - 1)
    i_rp = jnp.clip(m2.idx[i_rc], 0, n - 1)
    i_lp = jnp.clip(m3.idx[i_rp], 0, n - 1)
    i_back = m4.idx[i_lp]

    chain_ok = (m1.valid & m2.valid[i_rc] & m3.valid[i_rp]
                & m4.valid[i_lp])
    # circular closure: the chain must return to the starting feature
    # (quadmatcher.cpp:591-661's index-equality test)
    closed = chain_ok & (i_back == idx0)

    lc = f_lc.xy
    rc = f_rc.xy[i_rc]
    rp = f_rp.xy[i_rp]
    lp = f_lp.xy[i_lp]

    dy_c = jnp.abs(lc[:, 1] - rc[:, 1])
    dy_p = jnp.abs(lp[:, 1] - rp[:, 1])
    disp_c = lc[:, 0] - rc[:, 0]
    disp_p = lp[:, 0] - rp[:, 0]
    dy_l = jnp.abs(lc[:, 1] - lp[:, 1])
    dx_l = jnp.abs(lc[:, 0] - lp[:, 0])

    valid = (closed & f_lc.valid
             & (dy_c < qcfg.max_dy_stereo)
             & (dy_p < qcfg.max_dy_stereo)
             & (disp_c > qcfg.min_disparity)
             & (disp_p > qcfg.min_disparity)
             & (dy_l < qcfg.max_dy_temporal)
             & (dx_l < qcfg.max_dx_temporal))
    return QuadMatches(lp=lp, rp=rp, lc=lc, rc=rc, valid=valid)
