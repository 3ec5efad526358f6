#!/usr/bin/env python
"""Golden "KITTI-statistics" sequence (VERDICT r1 item 10).

A 500-frame loop circuit standing in for the reference's KITTI operating
sequences (/root/reference/parameters.txt:2-13): textured procedural world,
occluding structure inside and outside the corridor, independently moving
vehicles AND crossing pedestrians, sinusoidal platform pitch (exercising the
pitch-KF correction loop), and a genuine revisit — ``laps`` > 1 drives the
camera back through the start region *mid-run*, so BoW loop closure and the
chi2-triggered global optimization fire while tracking continues, not only
at ``finish()``.

Publishes ATE/RPE + loop/optimization counters to GOLDEN_r{N}.json and
appends a per-round row to docs/GOLDEN.md. Run on the real TPU:

    python golden.py [--frames 500] [--round 2]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

H, W = 376, 1248
RADIUS = 30.0
LAPS = 1.25
N_MOVING = 6
N_BOXES = 48
PITCH_AMP = 0.006
RENDER_CHUNK = 50
VOCAB_STRIDE = 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--round", type=int, default=0,
                    help="round number for the GOLDEN_r{N}.json artifact")
    ap.add_argument("--no-mapping", action="store_true")
    ap.add_argument("--rgbd", action="store_true",
                    help="run the RGB-D mode of the full system (TUM-style "
                         "ORB+PnP frontend, track.cpp:140-200; reverse-PnP "
                         "loop verification; depth-based clouds) on the "
                         "same loop circuit — gray+depth frames instead of "
                         "the stereo pair (VERDICT r4 item 7)")
    ap.add_argument("--nearby", type=int, default=None,
                    help="override pose_graph.nearby_keyframes (bisect aid)")
    ap.add_argument("--gt-semantics", action="store_true",
                    help="feed ground-truth labels instead of running the "
                         "shipped SegNet online (the default exercises "
                         "LEARNED semantics end-to-end, VERDICT r2 item 4)")
    ap.add_argument("--seed", type=int, default=7,
                    help="world seed (multi-seed robustness, VERDICT r3 #4)")
    ap.add_argument("--radius", type=float, default=RADIUS,
                    help="loop radius in m (larger -> longer runs with "
                         "more keyframes at reference scale)")
    ap.add_argument("--laps", type=float, default=LAPS)
    ap.add_argument("--revisit-offset", type=float, default=0.0,
                    help="lateral lane offset (m) of the second lap: the "
                         "revisit passes the start region in a parallel "
                         "lane, producing borderline 12-50-inlier loop "
                         "candidates (VERDICT r4 item 6)")
    ap.add_argument("--boxes", type=int, default=N_BOXES)
    ap.add_argument("--label", default="",
                    help="annotation naming this run's config in the "
                         "GOLDEN.md run log")
    ap.add_argument("--uniform-info", action="store_true",
                    help="r3 behavior ablation: uniform loop-edge "
                         "information + hard 25-inlier floor (vs the "
                         "default inlier-scaled information, floor 12)")
    ap.add_argument("--json-out", default=None,
                    help="override the output JSON path (default "
                         "GOLDEN_r{N}.json / GOLDEN.json)")
    args = ap.parse_args()

    os.makedirs(REPO / ".jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from semantic_slam_mapping_tpu.backend import looper as lp
    from semantic_slam_mapping_tpu.config import default_config
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic
    from semantic_slam_mapping_tpu.ops import orb as orb_mod
    from semantic_slam_mapping_tpu.pipeline import SlamSystem
    from semantic_slam_mapping_tpu.utils import metrics

    cfg = default_config()
    import dataclasses
    if args.nearby is not None:
        cfg = dataclasses.replace(cfg, pose_graph=dataclasses.replace(
            cfg.pose_graph, nearby_keyframes=args.nearby))
    if args.uniform_info:
        cfg = dataclasses.replace(cfg, pose_graph=dataclasses.replace(
            cfg.pose_graph, info_from_inliers=False, loop_min_inliers=25))
    if args.rgbd:
        # TUM-scale operating point (the reference's RGB-D path IS the TUM
        # path, rgbdframe.cpp:199-227): indoor-scale keyframe gating — the
        # KITTI 5.5 m threshold would span many ref-ring lifetimes of the
        # trackRefFrame frontend. Pair with --radius ~10.
        cfg = dataclasses.replace(cfg, pose_graph=dataclasses.replace(
            cfg.pose_graph, keyframe_min_translation=1.0,
            keyframe_min_rotation=0.4))
    K = Intrinsics.from_config(cfg.camera)
    F = args.frames

    print(f"rendering {F} frames at {H}x{W} on {jax.devices()[0].platform}",
          flush=True)
    world = synthetic.make_loop_world(jax.random.PRNGKey(args.seed),
                                      n_boxes=args.boxes,
                                      radius=args.radius, n_moving=N_MOVING)
    poses = synthetic.loop_trajectory(F, radius=args.radius, laps=args.laps,
                                      pitch_amp=PITCH_AMP,
                                      revisit_offset=args.revisit_offset)

    # render in chunks, keeping EVERYTHING on device (f16 frames): reading
    # 500 full-res frames back through the remote-TPU tunnel costs minutes;
    # the pipeline only pulls per-keyframe slices to host.
    def render_chunk(p, i):
        c = synthetic.render_sequence(K, world, p, H, W, start_index=i)
        # rgbd mode feeds the GT depth image (the TUM dataset's depth
        # channel role, rgbdframe.cpp:199-227) instead of the right frame
        second = c["depth"] if args.rgbd else c["right"]
        return (c["left"].astype(jnp.float16), second.astype(jnp.float16),
                c["semantic"].astype(jnp.int8))
    render = jax.jit(render_chunk)   # start_index traced: one compile
    t0 = time.time()
    chunks = [render(poses[s:s + RENDER_CHUNK], s)
              for s in range(0, F, RENDER_CHUNK)]
    left = jnp.concatenate([c[0] for c in chunks])
    right = jnp.concatenate([c[1] for c in chunks])
    sem = jnp.concatenate([c[2] for c in chunks])
    jax.block_until_ready(sem)
    gt = np.asarray(poses)
    del chunks
    print(f"rendered in {time.time() - t0:.1f}s", flush=True)

    # vocabulary from the sequence itself (the make-vocab offline role)
    t0 = time.time()
    extract = jax.jit(lambda im: orb_mod.extract(
        im.astype(jnp.float32), cfg.orb))
    descs = []
    for i in range(0, F, VOCAB_STRIDE):
        f = extract(left[i])
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = lp.build_vocabulary(np.concatenate(descs), branching=10, depth=4)
    print(f"vocab: {vocab.n_leaves} leaves in {time.time() - t0:.1f}s",
          flush=True)

    ckpt = (REPO / "semantic_slam_mapping_tpu" / "models" / "weights"
            / "segnet.pkl")
    use_learned = not args.gt_semantics and ckpt.exists()
    if use_learned:
        import dataclasses
        cfg = dataclasses.replace(cfg, segnet=dataclasses.replace(
            cfg.segnet, online=True, weights=str(ckpt)))
        print("semantics: LEARNED (online SegNet, shipped checkpoint)",
              flush=True)
    else:
        print("semantics: ground-truth labels", flush=True)
    system = SlamSystem(cfg, vocab=vocab,
                        enable_mapping=not args.no_mapping,
                        rgbd=args.rgbd)
    t0 = time.time()
    mid_run_global = None

    def frame_stream():
        # color=None: the mapper colors voxels from the grey keyframe image
        nonlocal mid_run_global
        for i in range(F):
            yield (left[i].astype(jnp.float32),
                   right[i].astype(jnp.float32),
                   None,
                   None if use_learned else sem[i])
            if system.n_global_optimizations > 0 and mid_run_global is None:
                mid_run_global = i
            if (i + 1) % 100 == 0:
                print(f"frame {i + 1}/{F}: kf={len(system.keyframes)} "
                      f"loops={system.n_loop_edges} "
                      f"opt={system.n_optimizations} "
                      f"({(i + 1) / (time.time() - t0):.2f} fps)",
                      flush=True)

    # pipelined driver: frame N+1's frontend is in flight on the device
    # while frame N's keyframe/backend work runs on the host
    if args.rgbd:
        system.process_stream_rgbd(frame_stream())
    else:
        system.process_stream(frame_stream())
    traj = np.stack(system.finish())
    wall = time.time() - t0
    print(system.timer.report(), flush=True)

    ate = metrics.absolute_trajectory_error(traj, gt)
    rpe_t, rpe_r = metrics.relative_pose_error(traj, gt)
    np.savez(REPO / f"golden_traj_r{args.round:02d}.npz", est=traj, gt=gt)
    sem_acc = None
    if use_learned and system.keyframes:
        accs = [float(np.mean(np.asarray(k.semantic)
                              == np.asarray(sem[k.frame_index],
                                            np.int32)))
                for k in system.keyframes if k.semantic is not None]
        sem_acc = round(float(np.mean(accs)), 4) if accs else None

    rec = {
        "sequence": (("rgbd-" if args.rgbd else "")
                     + f"golden-loop r={args.radius} laps={args.laps} "
                       f"moving={N_MOVING} pitch={PITCH_AMP}"),
        "mode": "rgbd" if args.rgbd else "stereo",
        "seed": args.seed,
        "label": args.label,
        "edge_info": ("uniform+floor25" if args.uniform_info
                      else "inlier-scaled+floor12"),
        "semantics": "learned-online" if use_learned else "ground-truth",
        "semantic_label_accuracy_vs_gt": sem_acc,
        "frames": F,
        "resolution": [H, W],
        "ate_rmse_m": round(float(ate.rmse), 4),
        "ate_mean_m": round(float(ate.mean), 4),
        "rpe_trans_rmse_m": round(float(rpe_t.rmse), 4),
        "rpe_rot_rmse_deg": round(float(np.degrees(rpe_r.rmse)), 4),
        "keyframes": len(system.keyframes),
        "loop_edges": system.n_loop_edges,
        "revisit_offset_m": args.revisit_offset,
        # inlier distributions: candidates that passed the PnP gate, and
        # accepted edges — shows whether the run exercises the 12-50
        # borderline band (VERDICT r4 item 6)
        "loop_candidate_inliers": sorted(system.loop_candidate_inliers),
        # (pnp_inliers, viso_ok, dt_m, dr_deg) per candidate: why the
        # verification accepted/rejected each one
        "loop_verify_log": [[v[0], v[1], round(v[2], 3), round(v[3], 2),
                             round(v[4], 3)]
                            for v in system.loop_verify_log],
        "loop_edge_inliers": sorted(system.loop_edge_inliers),
        "borderline_loop_edges": sum(
            1 for v in system.loop_edge_inliers if 12 <= v < 50),
        "global_optimizations": system.n_global_optimizations,
        "local_optimizations": system.n_local_optimizations,
        "first_global_opt_frame": mid_run_global,
        "mid_run_revisit_closed": bool(
            mid_run_global is not None and mid_run_global < 0.95 * F),
        "recoveries": system.n_recoveries,
        "map_voxels": len(system.map) if system.map is not None else None,
        "fps": round(F / wall, 3),
        "device": jax.devices()[0].platform,
    }
    out = (Path(args.json_out) if args.json_out
           else REPO / (f"GOLDEN_r{args.round:02d}.json" if args.round
                        else "GOLDEN.json"))
    out.write_text(json.dumps(rec, indent=2) + "\n")
    print(json.dumps(rec))

    # map artifact: PCD + orthographic PNG (the CloudViewer stand-in,
    # VERDICT r3 item 9; tools/map_view.py)
    if system.map is not None and len(system.map):
        import sys as _sys
        _sys.path.insert(0, str(REPO / "tools"))
        import map_view
        pcd = str(out.with_suffix(".pcd"))
        system.map.save_pcd(pcd)
        xyz, rgb = map_view.read_pcd(pcd)
        top, side = map_view.render(xyz, rgb, px=0.15)
        map_view.save_png(str(out.with_suffix(".map.png")), top, side)
        print(f"map artifact: {pcd} + {out.with_suffix('.map.png')}",
              flush=True)

    md = REPO / "docs" / "GOLDEN.md"
    if not md.exists():
        md.write_text(
            "# Golden-sequence tracking (per round)\n\n"
            "500-frame loop circuit with moving vehicles/pedestrians and a "
            "mid-run revisit (golden.py; VERDICT r1 item 10).\n\n"
            "| round | frames | ATE rmse (m) | RPE trans (m) | RPE rot "
            "(deg) | loop edges | global opts | mid-run closure | fps | "
            "device |\n|---|---|---|---|---|---|---|---|---|---|\n")
    import subprocess
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                cwd=REPO, capture_output=True,
                                text=True).stdout.strip()
    except Exception:
        commit = "?"
    with open(md, "a") as f:
        f.write(f"| r{args.round} {args.label} (seed {args.seed}, "
                f"r={args.radius:g}, laps={args.laps:g}, {commit}) "
                f"| {F} | {rec['ate_rmse_m']} | "
                f"{rec['rpe_trans_rmse_m']} | {rec['rpe_rot_rmse_deg']} | "
                f"{rec['loop_edges']} | {rec['global_optimizations']} | "
                f"{rec['mid_run_revisit_closed']} | {rec['fps']} | "
                f"{rec['device']} |\n")


if __name__ == "__main__":
    main()
