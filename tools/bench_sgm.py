#!/usr/bin/env python
"""SGM aggregation: Pallas kernel vs lax.scan on the real chip
(VERDICT r2 item 5 decision measurement).

Times the full sgbm.compute with cfg.use_pallas on/off at the KITTI
operating point. Perturbs inputs per rep and forces readbacks (the axon
relay memoizes identical executions)."""
import argparse
import dataclasses
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
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.ops import sgbm

H, W = 376, 1248


def bench(cfg, left, rights, label, reps):
    f = jax.jit(lambda l, r: sgbm.compute(l, r, cfg).disparity)
    t0 = time.time()
    jax.block_until_ready(f(left, rights[0]))
    print(f"{label}: compile+first {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(reps):
        jax.block_until_ready(f(left, rights[1 + i]))
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1e3:.1f} ms/frame", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    cfg0 = default_config().sgbm
    K = Intrinsics.from_config(default_config().camera)
    world = synthetic.make_world(jax.random.PRNGKey(0), n_boxes=14)
    poses = synthetic.straight_trajectory(args.reps + 2, speed=0.8)
    seq = jax.jit(lambda p: synthetic.render_sequence(
        K, world, p, H, W))(poses)
    left = seq["left"][0]
    rights = [seq["right"][i] for i in range(args.reps + 1)]

    t_scan = bench(dataclasses.replace(cfg0, use_pallas=False), left,
                   rights, "scan  ", args.reps)
    t_pal = bench(dataclasses.replace(cfg0, use_pallas=True), left,
                  rights, "pallas", args.reps)
    print(f"pallas/scan: {t_pal / t_scan:.3f}x", flush=True)


if __name__ == "__main__":
    main()
