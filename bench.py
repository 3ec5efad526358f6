#!/usr/bin/env python
"""Headline benchmark: full SLAM frontend frames/s at the KITTI operating
point (376x1248 stereo, SGBM 80 disparities, GFTT+KLT quad matching, 200-
hypothesis RANSAC VO, U-V-disparity moving-object masking — the per-frame
hot loop of the reference's segnet-slam, SURVEY.md §3.1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference-equivalent CPU frames/s recorded
in BASELINE_MEASURED.json (the reference publishes no numbers — BASELINE.md;
the anchor is this same pipeline run on the host CPU, measured via
`python bench.py --measure-cpu-baseline`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BASELINE_FILE = REPO / "BASELINE_MEASURED.json"
CACHE_DIR = str(REPO / ".jax_cache")

H, W = 376, 1248
N_FRAMES = 8
WARMUP = 2


def _setup_jax(cpu: bool):
    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(CACHE_DIR, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return jax


def run_frontend_bench(jax, n_frames: int = N_FRAMES,
                       batch: int = 8):
    """Throughput benchmark: batched-window tracking (see
    tracker.track_frames_batched) over windows of ``batch`` frame pairs —
    the deployment mode for sequence processing. Each timed window uses
    distinct frames (the axon runtime memoizes identical executions)."""
    import jax.numpy as jnp

    from semantic_slam_mapping_tpu.config import SlamConfig
    from semantic_slam_mapping_tpu.frontend import tracker
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic

    cfg = SlamConfig()  # reference operating point (KITTI intrinsics)
    K = Intrinsics.from_config(cfg.camera)
    world = synthetic.make_world(jax.random.PRNGKey(0), n_boxes=14)
    n_windows = max(1, n_frames // batch)
    total = n_windows * batch + WARMUP * batch + 1
    poses = synthetic.straight_trajectory(total, speed=0.8)
    seq = jax.jit(
        lambda p: synthetic.render_sequence(K, world, p, H, W))(poses)
    jax.block_until_ready(seq)

    state = tracker.TrackerState.initial()
    # precompute all RNG keys: no eager host ops inside the timed loop
    # (each eager op is a separate remote dispatch on this platform)
    all_keys = jax.random.split(jax.random.PRNGKey(1),
                                WARMUP + n_windows)
    all_keys = jax.block_until_ready(all_keys)

    if batch == 1:
        def window(state, start, key):
            return tracker.track_frame(
                state, seq["left"][start + 1], seq["right"][start + 1],
                seq["left"][start], seq["right"][start], K, key, cfg)
    else:
        def window(state, start, key):
            sl = slice(start, start + batch + 1)
            return tracker.track_frames_batched(
                state, seq["left"][sl], seq["right"][sl], K, key, cfg)

    # compile + warmup
    t_c0 = time.time()
    for wi in range(WARMUP):
        state, out = window(state, wi * batch, all_keys[wi])
        jax.block_until_ready(out.pose)
    compile_s = time.time() - t_c0

    t0 = time.time()
    oks = []
    for wi in range(n_windows):
        state, out = window(state, WARMUP * batch + wi * batch,
                            all_keys[WARMUP + wi])
        oks.append(out.vo_success)   # no per-iteration readback
    jax.block_until_ready(state.pose)
    dt = time.time() - t0
    n_ok = int(sum(int(jnp.sum(o)) for o in oks))
    done = n_windows * batch
    return done / dt, compile_s, n_ok, done


def run_e2e_bench(jax, n_frames: int = 40):
    """Full-system benchmark (VERDICT r1 item 5): SlamSystem with keyframes,
    ORB+BoW loop scoring, PnP/viso edge construction, chi2-triggered
    optimization, and dense semantic mapping, on a moving-object scene (the
    U-V-disparity stage works on real input). The reference's equivalent is
    exp_mapping.cpp:36-51. Returns (fps, compile_s, counters)."""
    import jax.numpy as jnp
    import numpy as np

    from semantic_slam_mapping_tpu.backend import looper as lp
    from semantic_slam_mapping_tpu.config import SlamConfig
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic
    from semantic_slam_mapping_tpu.ops import orb as orb_mod
    from semantic_slam_mapping_tpu.pipeline import SlamSystem

    # warmup must cross >=2 KEYFRAME EPOCHS so every keyframe-path program
    # (features, BoW, PnP edges, loop scoring, optimize, map cloud)
    # compiles BEFORE the timed window — the r3 bench compiled all of them
    # inside it, understating steady-state throughput ~4x. The frontend
    # bench excludes compiles the same way.
    WARM = 20
    import dataclasses

    import jax.numpy as jnp

    from semantic_slam_mapping_tpu.config import LooperConfig
    cfg = SlamConfig()
    # the e2e trajectory drives OUT then RETRACES the same poses, so the
    # timed window contains a genuine revisit (identical viewpoints) and
    # the headline carries loop-closure scoring AND verification cost
    # (VERDICT r4 weak 5: the r4 window was loop-free). min_interval
    # shrinks below the ~30-frame revisit gap of this short sequence (the
    # golden runs keep the reference's 60 at 500 frames).
    cfg = dataclasses.replace(cfg, looper=dataclasses.replace(
        LooperConfig(), min_interval=25))
    K = Intrinsics.from_config(cfg.camera)
    total = n_frames + WARM
    world = synthetic.make_world(jax.random.PRNGKey(0), n_boxes=14,
                                 n_moving=4)
    n_fwd = (total + 1) // 2 + 3
    fwd = synthetic.straight_trajectory(n_fwd, speed=0.8)
    back = fwd[n_fwd - 2::-1][:total - n_fwd]
    poses = jnp.concatenate([fwd, back], axis=0)
    seq = jax.jit(lambda p: synthetic.render_sequence(
        K, world, p, H, W))(poses)
    left = np.asarray(seq["left"], np.float32)
    right = np.asarray(seq["right"], np.float32)
    sem = np.asarray(seq["semantic"])

    f = orb_mod.extract(jnp.asarray(left[0]), cfg.orb)
    vocab = lp.build_vocabulary(np.asarray(f.desc)[np.asarray(f.valid)],
                                branching=10, depth=3)
    system = SlamSystem(cfg, vocab=vocab, enable_mapping=True)

    def item(i):
        g = (np.clip(left[i], 0, 1) * 255).astype(np.uint8)
        return (left[i], right[i], np.stack([g] * 3, -1), sem[i])

    # pipelined driver (frame N+1's frontend in flight during frame N's
    # keyframe/backend work) — the deployment mode for sequences
    t0 = time.time()
    system.process_stream(item(i) for i in range(WARM))
    # prime BOTH optimizer variants (global iters=10 / local iters=5 are
    # distinct compiled programs) so neither compiles inside the window
    system._maybe_optimize(force_global=True)
    if len(system.keyframes) > 1:
        system.local_error = 1e9
        system._maybe_optimize()
        # prime the loop-VERIFY program (batched quadmatch/VO re-measure):
        # the first in-window loop candidate would otherwise compile it
        # inside the timed region (~18 s remote compile). The distant pair
        # fails the PnP gate, so no edge is inserted.
        system._try_edges_batched([system.keyframes[0]],
                                  system.keyframes[-1], is_loop=True)
    compile_s = time.time() - t0
    system.timer = type(system.timer)()    # fresh stage table, post-warmup
    t0 = time.time()
    system.process_stream(item(i) for i in range(WARM, WARM + n_frames))
    system._drain_all()   # deferred loop/map harvests belong to the window
    dt = time.time() - t0
    counters = dict(keyframes=len(system.keyframes),
                    edges=system.n_edges,
                    loop_edges=system.n_loop_edges,
                    optimizations=system.n_optimizations,
                    map_voxels=len(system.map))
    print("# e2e stage table:", file=sys.stderr)
    for line in system.timer.report().splitlines():
        print("#   " + line, file=sys.stderr)
    return n_frames / dt, compile_s, counters


# chip peaks for %-of-peak accounting: device_kind prefix ->
# (bf16 FLOP/s, HBM bytes/s). Sources: public TPU spec sheets.
_CHIP_PEAKS = {
    # order matters: most-specific prefixes first ("TPU v5 lite" is the
    # v5e device_kind and must not match the v5p entry)
    "TPU v5 lite": (197e12, 819e9),   # v5e
    "TPU v5e": (197e12, 819e9),
    "TPU v6 lite": (918e12, 1640e9),  # v6e / Trillium
    "TPU v6e": (918e12, 1640e9),
    "TPU v5": (459e12, 1228e9),       # v5p
    "TPU v4": (275e12, 1228e9),
}
_DEFAULT_PEAK = (197e12, 819e9)


def _chip_peak(jax):
    kind = jax.devices()[0].device_kind
    for prefix, peaks in _CHIP_PEAKS.items():
        if kind.startswith(prefix):
            return kind, peaks
    return kind, _DEFAULT_PEAK


def _cost_of(compiled):
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return (float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)))


def _time_stage(jax, fn, args_fn, reps: int = 5):
    """Median wall time of fn over ``reps`` executions with PERTURBED
    inputs (the axon relay memoizes identical executions — memory/PERF.md)
    and a forced readback. Two warmup executions first: the relay performs
    lazy per-program initialization AFTER the first execution, and calls
    landing inside that window block on it (~25 ms) — without warmup every
    rep of a short timing loop absorbs it and the median reads ~100x high
    for microsecond-scale programs (r5 finding, docs/PERF.md)."""
    import time as _t
    for r in range(2):
        out = fn(*args_fn(r))
        jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        a = args_fn(r + 2)
        jax.block_until_ready(a)
        t0 = _t.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(_t.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def run_roofline(jax):
    """Per-stage FLOPs + HBM bytes from compiled-HLO cost analysis divided
    by measured stage time and chip peak (VERDICT r4 item 2): labels each
    hot kernel compute- vs bandwidth-bound so optimization targets come
    from the table, not guesses. Returns {chip, stages: {name: {...}}}."""
    import jax.numpy as jnp

    from semantic_slam_mapping_tpu.backend import pnp as pnp_mod
    from semantic_slam_mapping_tpu.config import SlamConfig
    from semantic_slam_mapping_tpu.frontend import quadmatch, tracker, vo
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic
    from semantic_slam_mapping_tpu.ops import orb as orb_mod
    from semantic_slam_mapping_tpu.ops import sgbm

    cfg = SlamConfig()
    K = Intrinsics.from_config(cfg.camera)
    kind, (peak_flops, peak_bw) = _chip_peak(jax)
    world = synthetic.make_world(jax.random.PRNGKey(0), n_boxes=14)
    poses = synthetic.straight_trajectory(8, speed=0.8)
    seq = jax.jit(lambda p: synthetic.render_sequence(
        K, world, p, H, W))(poses)
    L = jax.block_until_ready(seq["left"])
    R = jax.block_until_ready(seq["right"])
    key = jax.random.PRNGKey(1)

    stages = {}

    def add(name, jitted, args_fn, example):
        compiled = jitted.lower(*example).compile()
        flops, bytes_ = _cost_of(compiled)
        t = _time_stage(jax, compiled, args_fn)
        pf = flops / t / peak_flops
        pb = bytes_ / t / peak_bw
        stages[name] = {
            "ms": round(t * 1e3, 2),
            "gflop": round(flops / 1e9, 2),
            "hbm_mb": round(bytes_ / 1e6, 1),
            "pct_peak_flops": round(100 * pf, 2),
            "pct_peak_hbm": round(100 * pb, 2),
            # when neither resource is meaningfully utilized the stage is
            # limited by kernel-launch serialization (many tiny sequential
            # ops, e.g. scan-based GN iterations), not by FLOPs or HBM
            "bound": ("latency/serialization" if max(pf, pb) < 0.05
                      else "compute" if pf >= pb else "bandwidth"),
        }

    # --- SGBM (the frontend's biggest stage) ---
    f_sgbm = jax.jit(lambda l, r: sgbm.compute(l, r, cfg.sgbm))
    add("sgbm", f_sgbm, lambda i: (L[i % 7], R[(i + 1) % 7]),
        (L[0], R[0]))

    # --- quad matching (GFTT + 4x KLT chain + gates) ---
    f_qm = jax.jit(lambda cl, cr, pl, pr: quadmatch.quad_match(
        cur_left=cl, cur_right=cr, prev_left=pl, prev_right=pr,
        qcfg=cfg.quadmatch, gcfg=cfg.gftt, kcfg=cfg.klt))
    add("quadmatch", f_qm,
        lambda i: (L[i % 7 + 1], R[i % 7 + 1], L[i % 7], R[i % 7]),
        (L[1], R[1], L[0], R[0]))

    # --- RANSAC+GN VO on real matches ---
    m0 = jax.block_until_ready(f_qm(L[1], R[1], L[0], R[0]))
    f_vo = jax.jit(lambda m, k: vo.estimate_motion(m, K, k, cfg.vo))
    add("vo_ransac", f_vo,
        lambda i: (m0, jax.random.PRNGKey(i)), (m0, key))

    # --- full frontend step ---
    st = tracker.TrackerState.initial(cfg)
    f_tf = jax.jit(lambda s, cl, cr, pl, pr, k: tracker.track_frame(
        s, cl, cr, pl, pr, K, k, cfg))
    add("track_frame", f_tf,
        lambda i: (st, L[i % 7 + 1], R[i % 7 + 1], L[i % 7], R[i % 7],
                   jax.random.PRNGKey(i)),
        (st, L[1], R[1], L[0], R[0], key))

    # --- batched nearby-edge PnP gate (the keyframe-epoch program) ---
    nb = cfg.pose_graph.nearby_keyframes
    feats = orb_mod.extract(L[0], cfg.orb)
    from semantic_slam_mapping_tpu.geometry.camera import triangulate_stereo
    xyz = triangulate_stereo(K, feats.xy, jnp.full(feats.xy.shape[0], 8.0))
    desc_r = jnp.broadcast_to(feats.desc, (nb,) + feats.desc.shape)
    xyz_r = jnp.broadcast_to(xyz, (nb,) + xyz.shape)
    val_r = jnp.broadcast_to(feats.valid, (nb,) + feats.valid.shape)
    Ti = jnp.broadcast_to(jnp.eye(4), (nb, 4, 4))
    f_pnp = jax.jit(lambda dr, xr, vr, ti, d2, x2, v2: jax.vmap(
        lambda d, x, v, t: pnp_mod.solve_pnp_lazy(
            d, x, v, d2, x2, v2, K, t, cfg.pnp,
            cfg.orb.knn_match_ratio))(dr, xr, vr, ti))
    add("pnp_batch5", f_pnp,
        lambda i: (desc_r, xyz_r, val_r, Ti, feats.desc,
                   feats.xy + i * 0.001, feats.valid),
        (desc_r, xyz_r, val_r, Ti, feats.desc, feats.xy, feats.valid))

    # --- SegNet inference (mapping operating point 480x384) ---
    try:
        from semantic_slam_mapping_tpu.models import segnet as segnet_mod
        model, variables = segnet_mod.create(cfg.segnet)
        x = jnp.zeros((1, 384, 480, 3), jnp.float32)
        f_sn = jax.jit(lambda v, xx: segnet_mod.infer(model, v, xx))
        add("segnet_infer", f_sn,
            lambda i: (variables, x + i * 1e-3), (variables, x))
    except Exception as e:
        stages["segnet_infer"] = {"error": repr(e)[:120]}

    # headline MFU: the steady-state deployment program is the frontend
    # step; its cost-analysis FLOPs over its measured time vs chip peak
    tf = stages.get("track_frame", {})
    mfu = tf.get("pct_peak_flops", 0.0)
    return {"chip": kind,
            "peak_bf16_flops": peak_flops, "peak_hbm_Bps": peak_bw,
            "frontend_mfu_pct": mfu,
            "note": ("FLOPs/bytes from XLA compiled-HLO cost analysis; "
                     "times are solo warm-cache medians with perturbed "
                     "inputs; bound = larger of %peak-flops/%peak-HBM, "
                     "or latency/serialization when both are under 5%"),
            "stages": stages}


def run_scaling_analysis(jax, n_devices: int = 8):
    """Simulated multi-chip scaling of the frontend hot loop (VERDICT r1
    item 4). Real multi-chip hardware is unavailable (BASELINE.md), so the
    efficiency is derived from the compiled sharded program itself on an
    n-device virtual mesh: per-device FLOPs of the sharded window vs the
    collective bytes it moves. The sharded frontend's only collectives are
    all_gathers of per-pair scalars/4x4s (see parallel/sharded_frontend.py),
    so communication is KBs against ~10^10 per-device FLOPs; the projected
    efficiency on a v5e ICI (45 GB/s/link) is compute-bound.

    Returns dict with per-device flops, collective bytes, projected
    efficiency on v5e, and the virtual-mesh wall-time check."""
    import jax.numpy as jnp

    from semantic_slam_mapping_tpu.config import SlamConfig
    from semantic_slam_mapping_tpu.frontend import tracker
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic
    from semantic_slam_mapping_tpu.parallel import mesh as pmesh
    from semantic_slam_mapping_tpu.parallel.sharded_frontend import \
        track_frames_sharded

    cfg = SlamConfig()
    K = Intrinsics.from_config(cfg.camera)
    B = n_devices
    world = synthetic.make_world(jax.random.PRNGKey(0), n_boxes=10)
    poses = synthetic.straight_trajectory(B + 1, speed=0.8)
    seq = jax.jit(lambda p: synthetic.render_sequence(K, world, p, H, W))(
        poses)
    state = tracker.TrackerState.initial(cfg)
    key = jax.random.PRNGKey(1)

    mesh = pmesh.make_mesh(n_devices, dp=n_devices, tp=1)
    lowered = track_frames_sharded.lower(state, seq["left"], seq["right"],
                                         K, key, cfg, mesh)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    # collective traffic: the two all_gathers move (B floats + B 4x4s +
    # B bools) * n_devices in a ring — measure generously as every gathered
    # operand's full size per device
    gather_bytes = B * (4 + 64 + 1) * 4 * 2
    per_dev_flops = flops / n_devices
    # v5e: 197 TFLOP/s bf16 per chip, ICI ~45 GB/s per direction
    t_compute = per_dev_flops / 197e12
    t_comm = gather_bytes / 45e9
    eff = t_compute / (t_compute + t_comm)

    # correctness-of-execution check on the virtual mesh (times are host-
    # thread bound on CPU and not reported as a scaling claim)
    out = track_frames_sharded(state, seq["left"], seq["right"], K, key,
                               cfg, mesh)
    jax.block_until_ready(out[1].pose)

    return {
        "window": B,
        "total_flops": flops,
        "per_device_flops": per_dev_flops,
        "collective_bytes_per_window": gather_bytes,
        "projected_efficiency_v5e": round(eff, 6),
        "method": "compiled-HLO cost analysis of the shard_map program on "
                  f"an {n_devices}-device virtual mesh; collectives are "
                  "all_gathers of per-pair scalars/4x4s only",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-cpu-baseline", action="store_true",
                    help="measure the reference-equivalent CPU frames/s "
                         "and write BASELINE_MEASURED.json")
    ap.add_argument("--frames", type=int, default=N_FRAMES)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--e2e", action="store_true",
                    help="benchmark the FULL system (keyframes, BoW loops, "
                         "optimization, mapping) instead of the frontend "
                         "hot loop")
    ap.add_argument("--scaling", action="store_true",
                    help="analyze multi-chip scaling of the sharded "
                         "frontend on an 8-device virtual mesh")
    ap.add_argument("--roofline", action="store_true",
                    help="per-stage MFU/roofline table (FLOPs + HBM bytes "
                         "from compiled-HLO cost analysis vs measured "
                         "time and chip peak)")
    ap.add_argument("--full", action="store_true", default=True,
                    help="append e2e fps and scaling efficiency to the "
                         "headline JSON line (default)")
    ap.add_argument("--frontend-only", dest="full", action="store_false")
    args = ap.parse_args()

    jax = _setup_jax(cpu=args.measure_cpu_baseline or args.scaling)

    if args.scaling:
        if jax.device_count() < 8:
            from jax.extend import backend as _xb
            _xb.clear_backends()
            jax.config.update("jax_num_cpu_devices", 8)
        rec = run_scaling_analysis(jax, 8)
        print(json.dumps({
            "metric": "frontend_scaling_efficiency",
            "value": rec["projected_efficiency_v5e"],
            "unit": "fraction", "vs_baseline": 0.0, **rec}))
        return

    if args.roofline:
        rec = run_roofline(jax)
        print(json.dumps({
            "metric": "frontend_mfu",
            "value": rec["frontend_mfu_pct"],
            "unit": "% of peak bf16 FLOP/s", "vs_baseline": 0.0, **rec}))
        return

    if args.e2e:
        fps, compile_s, counters = run_e2e_bench(jax, max(args.frames, 24))
        base = None
        if BASELINE_FILE.exists():
            base = json.loads(BASELINE_FILE.read_text()).get("cpu_fps")
        print(json.dumps({
            "metric": "e2e_frames_per_s",
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(fps / base, 3) if base else 0.0,
        }))
        print(f"# e2e compile+warmup {compile_s:.1f}s, {counters}, "
              f"device {jax.devices()[0].platform}", file=sys.stderr)
        return

    fps, compile_s, n_ok, n = run_frontend_bench(jax, args.frames, args.batch)

    if args.measure_cpu_baseline:
        # record the JAX-on-CPU proxy; NEVER clobber the curated cpu_fps
        # reference-estimate anchor (see BASELINE_MEASURED.json note)
        rec = (json.loads(BASELINE_FILE.read_text())
               if BASELINE_FILE.exists() else
               {"metric": "frontend_frames_per_s", "cpu_fps": fps})
        rec["jax_cpu_fps"] = fps
        rec["frames"] = n
        BASELINE_FILE.write_text(json.dumps(rec, indent=2) + "\n")
        print(json.dumps({"metric": "frontend_frames_per_s_cpu",
                          "value": round(fps, 3), "unit": "frames/s",
                          "vs_baseline": 1.0}))
        return

    base = None
    if BASELINE_FILE.exists():
        base = json.loads(BASELINE_FILE.read_text()).get("cpu_fps")
    rec = {
        "metric": "frontend_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3) if base else 0.0,
    }

    if args.full:
        # one artifact with all three headline metrics (frontend fps,
        # e2e fps, scaling efficiency) — VERDICT r2 item 7
        try:
            e2e_fps, e2e_compile_s, counters = run_e2e_bench(jax, 40)
            rec["e2e_frames_per_s"] = round(e2e_fps, 3)
            rec["e2e_vs_baseline"] = (round(e2e_fps / base, 3)
                                      if base else 0.0)
            rec["e2e_counters"] = counters
            print(f"# e2e compile+warmup {e2e_compile_s:.1f}s",
                  file=sys.stderr)
        except Exception as e:  # record the failure, keep the headline
            rec["e2e_error"] = repr(e)[:200]
        try:
            rec["roofline"] = run_roofline(jax)
        except Exception as e:
            rec["roofline_error"] = repr(e)[:200]
        try:
            import subprocess
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            out = subprocess.run(
                [sys.executable, __file__, "--scaling"], env=env,
                capture_output=True, text=True, timeout=3600)
            sc = json.loads(out.stdout.strip().splitlines()[-1])
            rec["scaling_efficiency"] = sc["value"]
            rec["scaling_method"] = sc.get("method", "")
        except Exception as e:
            rec["scaling_error"] = repr(e)[:200]

    print(json.dumps(rec))
    print(f"# compile+warmup {compile_s:.1f}s, vo_success {n_ok}/{n}, "
          f"device {jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
