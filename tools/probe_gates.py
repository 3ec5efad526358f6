#!/usr/bin/env python
"""Quad-match gate attrition on the golden circuit: how many features
survive detection, each KLT leg, and each geometric gate (the
filteringTracks analysis the reference prints counts for,
quadmatcher.cpp:375-414)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import default_config
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.ops import corners, image as im, klt
from semantic_slam_mapping_tpu.ops import sgbm
from semantic_slam_mapping_tpu.ops.image import bilinear_sample

H, W = 376, 1248


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--total", type=int, default=500)
    ap.add_argument("--start", type=int, default=10)
    args = ap.parse_args()

    cfg = default_config()
    K = Intrinsics.from_config(cfg.camera)
    qcfg, gcfg, kcfg = cfg.quadmatch, cfg.gftt, cfg.klt

    world = synthetic.make_loop_world(jax.random.PRNGKey(7), n_boxes=48,
                                      radius=30.0, n_moving=6)
    poses = synthetic.loop_trajectory(args.total, radius=30.0, laps=1.25,
                                      pitch_amp=0.006)
    sl = slice(args.start, args.start + args.frames + 1)

    CH = 50
    def render_chunk(p, i):
        c = synthetic.render_sequence(K, world, p, H, W, start_index=i)
        return c["left"].astype(jnp.float16), c["right"].astype(jnp.float16)
    render = jax.jit(render_chunk)
    lo = (args.start // CH) * CH
    hi = -(-(args.start + args.frames + 1) // CH) * CH
    chunks = [render(poses[s:s + CH], s) for s in range(lo, hi, CH)]
    left = jnp.concatenate([c[0] for c in chunks]).astype(jnp.float32)
    right = jnp.concatenate([c[1] for c in chunks]).astype(jnp.float32)
    off = args.start - lo
    print("rendered", flush=True)

    @jax.jit
    def gates(cl, cr, pl, pr):
        sg = sgbm.compute(cl, cr, cfg.sgbm)
        disp = jnp.where(sg.valid, sg.disparity, 0.0)
        kp = corners.gftt(cl, max_corners=qcfg.max_features,
                          quality_level=gcfg.quality_level,
                          min_distance=gcfg.min_distance,
                          block_size=gcfg.block_size)
        lc = kp.xy
        pyr = {n: tuple(im.build_pyramid(img_, kcfg.pyramid_levels, 2.0))
               for n, img_ in (("lc", cl), ("rc", cr), ("lp", pl),
                               ("rp", pr))}
        d0 = jnp.maximum(bilinear_sample(disp, lc), 0.0)
        stereo_init = jnp.stack([-d0, jnp.zeros_like(d0)], axis=-1)
        leg_rc = klt.track_pyramid(pyr["lc"], pyr["rc"], lc, kcfg,
                                   stereo_init)
        leg_rp = klt.track_pyramid(pyr["rc"], pyr["rp"], leg_rc.xy, kcfg)
        leg_lp = klt.track_pyramid(pyr["rp"], pyr["lp"], leg_rp.xy, kcfg)
        direct_lp = klt.track_pyramid(pyr["lc"], pyr["lp"], lc, kcfg)
        rc, rp, lp, lp2 = leg_rc.xy, leg_rp.xy, leg_lp.xy, direct_lp.xy
        dy_c = jnp.abs(lc[:, 1] - rc[:, 1])
        dy_p = jnp.abs(lp[:, 1] - rp[:, 1])
        disp_c = lc[:, 0] - rc[:, 0]
        disp_p = lp[:, 0] - rp[:, 0]
        dy_l = jnp.abs(lc[:, 1] - lp[:, 1])
        dx_l = jnp.abs(lc[:, 0] - lp[:, 0])
        closure = jnp.linalg.norm(lp - lp2, axis=-1)
        t = kp.valid
        stats = {"detected": jnp.sum(t)}
        t = t & leg_rc.status
        stats["leg_rc"] = jnp.sum(t)
        t = t & leg_rp.status
        stats["leg_rp"] = jnp.sum(t)
        t = t & leg_lp.status
        stats["leg_lp"] = jnp.sum(t)
        t = t & direct_lp.status
        stats["direct_lp"] = jnp.sum(t)
        g = t & (dy_c < qcfg.max_dy_stereo)
        stats["dy_c"] = jnp.sum(g)
        g = g & (dy_p < qcfg.max_dy_stereo)
        stats["dy_p"] = jnp.sum(g)
        g = g & (disp_c > qcfg.min_disparity)
        stats["disp_c"] = jnp.sum(g)
        g = g & (disp_p > qcfg.min_disparity)
        stats["disp_p"] = jnp.sum(g)
        g = g & (dy_l < qcfg.max_dy_temporal) & (dx_l < qcfg.max_dx_temporal)
        stats["temporal"] = jnp.sum(g)
        g = g & (closure < qcfg.loop_consistency_px)
        stats["closure"] = jnp.sum(g)
        # medians of the gate statistics over leg-tracked features
        meds = {"med_dy_c": jnp.nanmedian(jnp.where(t, dy_c, jnp.nan)),
                "med_closure": jnp.nanmedian(jnp.where(t, closure, jnp.nan)),
                "med_dx_l": jnp.nanmedian(jnp.where(t, dx_l, jnp.nan)),
                "med_disp_c": jnp.nanmedian(jnp.where(t, disp_c, jnp.nan))}
        return stats, meds

    for i in range(off + 1, off + 1 + args.frames):
        s, m = gates(left[i], right[i], left[i - 1], right[i - 1])
        s = {k: int(v) for k, v in s.items()}
        m = {k: round(float(v), 2) for k, v in m.items()}
        print(f"f{args.start + i - off}: {s} {m}", flush=True)


if __name__ == "__main__":
    main()
