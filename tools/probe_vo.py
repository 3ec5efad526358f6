#!/usr/bin/env python
"""Per-frame frontend health on the golden loop circuit (runs on the TPU).

Renders an arc of the golden sequence (same world/trajectory parameters as
golden.py) and reports per-frame VO delta-pose error in ONE convention:
    E = inv(T_delta_gt) @ T_delta_est,   T_delta_gt = inv(gt[i]) @ gt[i-1]
(T_delta maps previous-camera coords to current-camera coords, matching
vo.estimate_motion and the tracker's pose = pose * inv(T_delta)).

Usage: python tools/probe_vo.py [--frames 48] [--total 500] [--start 0]
  --total sets the frame count of the full circuit (the motion per frame),
  --frames how many to actually run, --start where on the circle to begin.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), os.pardir,
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import default_config
from semantic_slam_mapping_tpu.frontend import tracker
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.utils import metrics

H, W = 376, 1248


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--total", type=int, default=500)
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()

    cfg = default_config()
    K = Intrinsics.from_config(cfg.camera)
    F, START = args.frames, args.start

    world = synthetic.make_loop_world(jax.random.PRNGKey(7), n_boxes=48,
                                      radius=30.0, n_moving=6)
    poses = synthetic.loop_trajectory(args.total, radius=30.0, laps=1.25,
                                      pitch_amp=0.006)[START:START + F]
    t0 = time.time()
    # chunked jitted rendering, same shapes as golden.py (shares its
    # compile cache); f16 storage like golden
    CH = 50
    def render_chunk(p, i):
        c = synthetic.render_sequence(K, world, p, H, W, start_index=i)
        return c["left"].astype(jnp.float16), c["right"].astype(jnp.float16)
    render = jax.jit(render_chunk)
    pad = (-F) % CH
    poses_p = jnp.concatenate([poses, jnp.repeat(poses[-1:], pad, 0)]) \
        if pad else poses
    chunks = [render(poses_p[s:s + CH], START + s) for s in range(0, F + pad, CH)]
    left = jnp.concatenate([c[0] for c in chunks])[:F].astype(jnp.float32)
    right = jnp.concatenate([c[1] for c in chunks])[:F].astype(jnp.float32)
    jax.block_until_ready(right)
    gt = np.asarray(poses)
    print(f"rendered {F} frames in {time.time() - t0:.1f}s "
          f"({jax.devices()[0].platform})", flush=True)

    state = tracker.TrackerState.initial(cfg)
    step = jax.jit(lambda st, l, r, pl, pr, k: tracker.track_frame(
        st, l, r, pl, pr, K, k, cfg))
    keys = jax.random.split(jax.random.PRNGKey(0), F)
    est = [np.eye(4)]
    t0 = time.time()
    for i in range(1, F):
        state, out = step(state, left[i], right[i], left[i - 1],
                          right[i - 1], keys[i])
        est.append(np.asarray(out.pose))
        T_gt_delta = np.linalg.inv(gt[i]) @ gt[i - 1]
        E = np.linalg.inv(T_gt_delta) @ np.asarray(out.T_delta)
        dt = float(np.linalg.norm(E[:3, 3]))
        dr = float(np.asarray(se3.rotation_angle(jnp.asarray(E))))
        print(f"f{START + i}: ok={int(out.vo_success)} "
              f"m={int(out.n_matches)} inl={int(out.n_inliers)} "
              f"dt={dt:.4f}m dr={np.degrees(dr):.4f}deg", flush=True)
    print(f"tracked at {(F - 1) / (time.time() - t0):.2f} fps", flush=True)

    # est poses are in the frame of gt[START]; align both to start at I
    gt_rel = np.linalg.inv(gt[0])[None] @ gt
    ate = metrics.absolute_trajectory_error(np.stack(est), gt_rel)
    print("ATE rmse", round(float(ate.rmse), 4), "m over", F, "frames")


if __name__ == "__main__":
    main()
