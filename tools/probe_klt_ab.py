#!/usr/bin/env python
"""A/B: our Pallas-free JAX KLT vs OpenCV calcOpticalFlowPyrLK on the SAME
golden-circuit frames, scored against ground truth.

Renders frame pair (i-1, i) + the stereo pair of frame i, picks GFTT
corners, and measures per-tracker accuracy against the analytic ground
truth: stereo flow = (-disparity, 0) from the GT depth; temporal flow from
reprojecting the GT 3D point into the previous frame. Prints the fraction
of tracks within 1 px / 3 px and the median error for each tracker.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import cv2
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import default_config
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.ops import corners, image as im, klt

H, W = 376, 1248


def stats(err, valid):
    e = err[valid]
    if len(e) == 0:
        return "no tracks"
    return (f"n={len(e)} <1px {np.mean(e < 1.0):.2f} "
            f"<3px {np.mean(e < 3.0):.2f} med {np.median(e):.2f}px")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=int, default=12)
    ap.add_argument("--total", type=int, default=500)
    args = ap.parse_args()

    cfg = default_config()
    K = Intrinsics.from_config(cfg.camera)
    kcfg = cfg.klt
    world = synthetic.make_loop_world(jax.random.PRNGKey(7), n_boxes=48,
                                      radius=30.0, n_moving=6)
    poses = synthetic.loop_trajectory(args.total, radius=30.0, laps=1.25,
                                      pitch_amp=0.006)
    i = args.frame

    def rend(T, idx):
        offs = (world.box_velocity * idx
                if world.box_velocity is not None else None)
        img, depth, _, _ = synthetic.render(K, T, world, H, W, offs)
        return img, depth

    cur_l, cur_d = rend(poses[i], float(i))
    prev_l, _ = rend(poses[i - 1], float(i - 1))
    cur_r, _ = rend(synthetic.right_camera_pose(poses[i], K.baseline),
                    float(i))
    cur_l, cur_d, prev_l, cur_r = map(np.asarray,
                                      (cur_l, cur_d, prev_l, cur_r))
    print("rendered", flush=True)

    kp = corners.gftt(jnp.asarray(cur_l), max_corners=512,
                      quality_level=cfg.gftt.quality_level,
                      min_distance=cfg.gftt.min_distance,
                      block_size=cfg.gftt.block_size)
    pts = np.asarray(kp.xy)
    pval = np.asarray(kp.valid)

    # ---- ground truth ----
    ui, vi = pts[:, 0], pts[:, 1]
    z = cv2.remap(cur_d, ui.astype(np.float32).reshape(-1, 1),
                  vi.astype(np.float32).reshape(-1, 1),
                  cv2.INTER_LINEAR).reshape(-1)
    fx, cx, cy = float(K.fx), float(K.cx), float(K.cy)
    bf = fx * float(K.baseline)
    disp_gt = bf / np.maximum(z, 1e-3)
    gt_stereo = pts + np.stack([-disp_gt, np.zeros_like(disp_gt)], -1)
    # temporal: backproject with GT depth, transform cur->prev, project
    X = np.stack([(ui - cx) * z / fx, (vi - cy) * z / fx, z], -1)
    T_rel = np.linalg.inv(np.asarray(poses[i - 1])) @ np.asarray(poses[i])
    Xp = X @ T_rel[:3, :3].T + T_rel[:3, 3]
    gt_temp = np.stack([fx * Xp[:, 0] / Xp[:, 2] + cx,
                        fx * Xp[:, 1] / Xp[:, 2] + cy], -1)
    ok_gt = pval & (z > 1.0) & (z < 200.0) & np.isfinite(gt_temp).all(-1)

    # ---- ours ----
    def track(a, b):
        ta = tuple(im.build_pyramid(jnp.asarray(a), kcfg.pyramid_levels, 2.0))
        tb = tuple(im.build_pyramid(jnp.asarray(b), kcfg.pyramid_levels, 2.0))
        r = klt.track_pyramid(ta, tb, jnp.asarray(pts), kcfg)
        return np.asarray(r.xy), np.asarray(r.status)

    xy_s, st_s = track(cur_l, cur_r)
    xy_t, st_t = track(cur_l, prev_l)
    err_s = np.linalg.norm(xy_s - gt_stereo, axis=-1)
    err_t = np.linalg.norm(xy_t - gt_temp, axis=-1)
    print("ours  stereo :", stats(err_s, ok_gt & st_s), flush=True)
    print("ours  temporal:", stats(err_t, ok_gt & st_t), flush=True)

    # ---- OpenCV ----
    u8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)
    lk = dict(winSize=(11, 11), maxLevel=kcfg.pyramid_levels - 1,
              criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                        kcfg.max_iterations, kcfg.epsilon))
    p0 = pts.astype(np.float32).reshape(-1, 1, 2)
    cv_s, st1, _ = cv2.calcOpticalFlowPyrLK(u8(cur_l), u8(cur_r), p0, None,
                                            **lk)
    cv_t, st2, _ = cv2.calcOpticalFlowPyrLK(u8(cur_l), u8(prev_l), p0, None,
                                            **lk)
    err_cs = np.linalg.norm(cv_s[:, 0] - gt_stereo, axis=-1)
    err_ct = np.linalg.norm(cv_t[:, 0] - gt_temp, axis=-1)
    print("opencv stereo :", stats(err_cs, ok_gt & (st1[:, 0] > 0)))
    print("opencv temporal:", stats(err_ct, ok_gt & (st2[:, 0] > 0)))


if __name__ == "__main__":
    main()
