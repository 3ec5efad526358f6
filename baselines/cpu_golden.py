#!/usr/bin/env python
"""Head-to-head parity run: the reference-equivalent CPU stack on the SAME
golden frames the TPU framework is scored on (VERDICT r3 item 3).

KITTI itself cannot be downloaded in this environment, so this is the
available stand-in for real-dataset validation: the measured CPU reference
frontend (baselines/cpu_reference.py — OpenCV SGBM / GFTT / pyramidal KLT /
RANSAC-GN VO at the reference's parameters) is extended with the
reference's HOST pipeline around it, g2o-free:

  - pose integration  pose = pose @ inv(Tr)      (track.cpp:82-87)
  - keyframe policy   dt > 5.5 m or dr > 2.5     (pose_graph.cpp:29-36)
  - ORB per keyframe  cv2.ORB (the ORB_SLAM2 ORBextractor role, orb.h:21-26)
  - nearby edges      BF ratio-test match + cv2.solvePnPRansac gate
                      (pnp.cpp:120-226, pose_graph.cpp:108-179)
  - loop closure      exhaustive candidate scan over keyframes with frame
                      gap > 60 (looper.cpp:5-18; BoW replaced by direct ORB
                      matching — MORE permissive than DBoW2, so the CPU
                      baseline errs in its own favor) + the same PnP gate
                      (pose_graph.cpp:181-234)
  - pose graph        numpy Levenberg-Marquardt over SE(3) with Huber and
                      the reference's chi2 triggers (global > 4.0 free-all/
                      fix-v0 10 iters; local > 1.0 last-5 free,
                      pose_graph.cpp:238-296), numeric Jacobians, dense
                      6Mx6M normal equations (Cholmod's role at this scale)
  - export            every frame re-derived through its keyframe anchor
                      (same convention as SlamSystem.finish, so both sides'
                      ATE measures the same thing)

Run (CPU-only, ~15 min at 500 frames):

    python baselines/cpu_golden.py [--frames 500] [--seed 7] [--write]

`--write` records cpu_golden ATE/fps into BASELINE_MEASURED.json; the
side-by-side table lives in docs/GOLDEN.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "baselines"))

from cpu_reference import (circular_klt, gftt, sgbm, vo_ransac,  # noqa: E402
                           FOCAL, CU, CV_, BASE, H, W)

# reference parameters (parameters.txt:85-93, pose_graph.cpp:29-36)
KF_MIN_T = 5.5
KF_MIN_R = 2.5
NEARBY = 5
LOOP_GAP = 60
INFO_W = 100.0
LOOP_ACC = 4.0
LOCAL_ACC = 1.0
LOCAL_WIN = 5
HUBER = 5.991 ** 0.5


# ---------------------------------------------------------------- SE(3)
def so3_exp(w):
    R, _ = cv2.Rodrigues(np.asarray(w, np.float64))
    return R


def so3_log(R):
    w, _ = cv2.Rodrigues(np.asarray(R, np.float64))
    return w[:, 0]


def se3_log(T):
    w = so3_log(T[:3, :3])
    th = np.linalg.norm(w)
    if th < 1e-8:
        V_inv = np.eye(3)
    else:
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]]) / th
        V_inv = (np.eye(3) - 0.5 * th * K
                 + (1 - th / (2 * np.tan(th / 2))) * (K @ K))
    return np.concatenate([V_inv @ T[:3, 3], w])


def se3_exp(x):
    t, w = x[:3], x[3:]
    th = np.linalg.norm(w)
    R = so3_exp(w)
    if th < 1e-8:
        V = np.eye(3)
    else:
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]]) / th
        V = (np.eye(3) + (1 - np.cos(th)) / th * K
             + (th - np.sin(th)) / th * (K @ K))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ t
    return T


# ---------------------------------------------------- pose-graph LM (numpy)
def edge_residual(poses, i, j, T_meas):
    rel = np.linalg.inv(poses[i]) @ poses[j]
    return se3_log(np.linalg.inv(T_meas) @ rel)


def optimize_graph(poses, edges, free, iters=10):
    """Dense LM over SE(3) vertices: numeric Jacobians of the se3-log edge
    residual, Huber IRLS, damped normal equations (the g2o BlockSolver +
    Cholmod + Levenberg role at golden scale, pose_graph.h:53-64)."""
    poses = [p.copy() for p in poses]
    M = len(poses)
    free_idx = [i for i in range(M) if free[i]]
    col = {v: k for k, v in enumerate(free_idx)}
    n = 6 * len(free_idx)
    if n == 0 or not edges:
        return poses
    lam = 1e-2
    EPS = 1e-6

    def total_cost(ps):
        c = 0.0
        for (i, j, T_meas, info) in edges:
            r = edge_residual(ps, i, j, T_meas)
            rn = np.sqrt(info * (r @ r) + 1e-12)
            c += rn * rn if rn <= HUBER else 2 * HUBER * rn - HUBER ** 2
        return c

    for _ in range(iters):
        A = np.zeros((n, n))
        b = np.zeros(n)
        for (i, j, T_meas, info) in edges:
            r = edge_residual(poses, i, j, T_meas)
            rn = np.sqrt(info * (r @ r) + 1e-12)
            wgt = info * min(1.0, HUBER / max(rn, 1e-9))
            Js = {}
            for v in (i, j):
                if v not in col:
                    continue
                Jv = np.zeros((6, 6))
                for k in range(6):
                    d = np.zeros(6)
                    d[k] = EPS
                    pp = poses[v]
                    poses[v] = se3_exp(d) @ pp
                    rp = edge_residual(poses, i, j, T_meas)
                    poses[v] = pp
                    Jv[:, k] = (rp - r) / EPS
                Js[v] = Jv
            for v, Jv in Js.items():
                cv0 = 6 * col[v]
                b[cv0:cv0 + 6] -= wgt * (Jv.T @ r)
                for u, Ju in Js.items():
                    cu0 = 6 * col[u]
                    A[cv0:cv0 + 6, cu0:cu0 + 6] += wgt * (Jv.T @ Ju)
        Ad = A + lam * np.diag(np.maximum(np.diag(A), 1e-6))
        try:
            dx = np.linalg.solve(Ad, b)
        except np.linalg.LinAlgError:
            break
        cand = [p.copy() for p in poses]
        for v in free_idx:
            cand[v] = se3_exp(np.clip(dx[6 * col[v]:6 * col[v] + 6],
                                      -1.0, 1.0)) @ cand[v]
        if total_cost(cand) < total_cost(poses):
            poses = cand
            lam = max(lam * 0.5, 1e-6)
        else:
            lam = min(lam * 8.0, 1e4)
    return poses


# ------------------------------------------------------------- keyframes
ORB = cv2.ORB_create(nfeatures=1000, scaleFactor=1.2, nlevels=8,
                     fastThreshold=20)
MATCHER = cv2.BFMatcher(cv2.NORM_HAMMING)
K_MAT = np.array([[FOCAL, 0, CU], [0, FOCAL, CV_], [0, 0, 1]])


class KF:
    def __init__(self, kf_id, frame_index, pose, img, disp16):
        self.kf_id = kf_id
        self.frame_index = frame_index
        self.pose = pose.copy()
        kps, desc = ORB.detectAndCompute(img, None)
        self.desc = desc if desc is not None else np.zeros((0, 32), np.uint8)
        uv = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
        d = np.zeros(len(uv), np.float32)
        if len(uv):
            ui = np.clip(uv[:, 0].astype(int), 0, W - 1)
            vi = np.clip(uv[:, 1].astype(int), 0, H - 1)
            d = disp16[vi, ui].astype(np.float32) / 16.0
        ok = d > 0.5
        Z = FOCAL * BASE / np.maximum(d, 0.5)
        self.uv = uv
        self.xyz = np.stack([(uv[:, 0] - CU) * Z / FOCAL,
                             (uv[:, 1] - CV_) * Z / FOCAL, Z], -1)
        self.valid = ok


def pnp_edge(ref: KF, cur: KF, T_init):
    """solvePnPLazy role (pnp.cpp:120-226): ratio-test ORB matches of cur's
    2D against ref's 3D, PnP-RANSAC, >=15 matches / >=10 inliers gate.
    Returns (T_meas = inv(pose_ref) pose_cur measurement, n_inliers)."""
    if len(ref.desc) < 15 or len(cur.desc) < 15:
        return None
    pairs = MATCHER.knnMatch(cur.desc, ref.desc, k=2)
    obj, img = [], []
    for m in pairs:
        if len(m) == 2 and m[0].distance < 0.8 * m[1].distance:
            ri = m[0].trainIdx
            if ref.valid[ri]:
                obj.append(ref.xyz[ri])
                img.append(cur.uv[m[0].queryIdx])
    if len(obj) < 15:
        return None
    obj = np.asarray(obj, np.float64)
    img = np.asarray(img, np.float64)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        obj, img, K_MAT, None, reprojectionError=3.0, iterationsCount=100,
        flags=cv2.SOLVEPNP_ITERATIVE)
    if not ok or inl is None or len(inl) < 10:
        return None
    T_cur_ref = np.eye(4)
    T_cur_ref[:3, :3] = so3_exp(rvec[:, 0])
    T_cur_ref[:3, 3] = tvec[:, 0]
    return np.linalg.inv(T_cur_ref), len(inl)


# ------------------------------------------------------------------ main
def render_golden(n_frames, seed, radius, laps):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from semantic_slam_mapping_tpu.config import default_config
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic

    K = Intrinsics.from_config(default_config().camera)
    world = synthetic.make_loop_world(jax.random.PRNGKey(seed), n_boxes=48,
                                      radius=radius, n_moving=6)
    poses = synthetic.loop_trajectory(n_frames, radius=radius, laps=laps,
                                      pitch_amp=0.006)
    lefts = np.empty((n_frames, H, W), np.uint8)
    rights = np.empty((n_frames, H, W), np.uint8)
    render = jax.jit(lambda p, i: synthetic.render_sequence(
        K, world, p, H, W, start_index=i))
    CH = 25
    for s in range(0, n_frames, CH):
        c = render(poses[s:s + CH], s)
        to8 = lambda a: np.asarray(  # noqa: E731
            np.clip(np.asarray(a) * 255, 0, 255), np.uint8)
        lefts[s:s + CH] = to8(c["left"])
        rights[s:s + CH] = to8(c["right"])
    return lefts, rights, np.asarray(poses)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--radius", type=float, default=30.0)
    ap.add_argument("--laps", type=float, default=1.25)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    print(f"rendering {args.frames} golden frames (seed {args.seed}) "
          f"on CPU...", flush=True)
    t0 = time.time()
    lefts, rights, gt = render_golden(args.frames, args.seed, args.radius,
                                      args.laps)
    print(f"rendered in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    pose = np.eye(4)
    traj = [np.eye(4)]
    anchors = [(-1, np.eye(4))]
    kfs: list = []
    edges: list = []   # (i, j, T_meas, info)
    local_err = 0.0
    loop_err = 0.0
    n_loop_edges = 0
    n_global = 0
    n_local = 0
    _ = sgbm(lefts[0], rights[0])   # warmup

    t0 = time.time()
    for fi in range(1, args.frames):
        lc, rc, lp, rp = lefts[fi], rights[fi], lefts[fi - 1], rights[fi - 1]
        disp = sgbm(lc, rc)
        pts = gftt(lc)
        a, b, c, d = circular_klt(lc, rc, lp, rp, pts)
        res = vo_ransac(a[:, 0], a[:, 1], b[:, 0], c[:, 0], c[:, 1],
                        d[:, 0], rng)
        if res is not None:
            params, _inl = res
            Tr = np.eye(4)
            Rm, _ = cv2.Rodrigues(np.zeros(3))
            # libviso2 convention R = Rx@Ry@Rz (vo_stereo.cpp:243-273)
            rx, ry, rz = params[:3]
            Rx = np.array([[1, 0, 0], [0, np.cos(rx), -np.sin(rx)],
                           [0, np.sin(rx), np.cos(rx)]])
            Ry = np.array([[np.cos(ry), 0, np.sin(ry)], [0, 1, 0],
                           [-np.sin(ry), 0, np.cos(ry)]])
            Rz = np.array([[np.cos(rz), -np.sin(rz), 0],
                           [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
            Tr[:3, :3] = Rx @ Ry @ Rz
            Tr[:3, 3] = params[3:6]
            pose = pose @ np.linalg.inv(Tr)   # track.cpp:82-87
        traj.append(pose.copy())
        if kfs:
            anchors.append((kfs[-1].kf_id,
                            np.linalg.inv(kfs[-1].pose) @ pose))
        else:
            anchors.append((-1, pose.copy()))

        # keyframe policy (pose_graph.cpp:29-36)
        if kfs:
            rel = np.linalg.inv(kfs[-1].pose) @ pose
            dt = float(np.linalg.norm(rel[:3, 3]))
            dr = float(np.arccos(np.clip(
                0.5 * (np.trace(rel[:3, :3]) - 1.0), -1, 1)))
            due = dt > KF_MIN_T or dr > KF_MIN_R
        else:
            due = True
        if not due:
            continue
        kf = KF(len(kfs), fi, pose, lc, disp)
        kfs.append(kf)
        anchors[-1] = (kf.kf_id, np.eye(4))
        if kf.kf_id == 0:
            continue
        prev = kfs[-2]
        edges.append((prev.kf_id, kf.kf_id,
                      np.linalg.inv(prev.pose) @ kf.pose, INFO_W))
        # nearby edges (pose_graph.cpp:108-179)
        for ref in kfs[-1 - NEARBY:-2]:
            got = pnp_edge(ref, kf, None)
            if got is None:
                continue
            T_meas, _n = got
            r = edge_residual([ref.pose, kf.pose], 0, 1, T_meas)
            edges.append((ref.kf_id, kf.kf_id, T_meas, INFO_W))
            local_err += INFO_W * float(r @ r)
        # loop closure: exhaustive scan, gap > 60 frames (looper.cpp:5-18)
        for ref in kfs[:-1]:
            if abs(kf.frame_index - ref.frame_index) <= LOOP_GAP:
                continue
            got = pnp_edge(ref, kf, None)
            if got is None:
                continue
            T_meas, _n = got
            r = edge_residual([ref.pose, kf.pose], 0, 1, T_meas)
            edges.append((ref.kf_id, kf.kf_id, T_meas, INFO_W))
            loop_err += INFO_W * float(r @ r)
            n_loop_edges += 1
        # chi2-triggered optimization (pose_graph.cpp:238-296)
        did = False
        poses = [k.pose for k in kfs]
        if loop_err > LOOP_ACC:
            free = [i != 0 for i in range(len(kfs))]
            poses = optimize_graph(poses, edges, free, iters=10)
            loop_err = local_err = 0.0
            n_global += 1
            did = True
        elif local_err > LOCAL_ACC:
            free = [max(1, len(kfs) - LOCAL_WIN) <= i < len(kfs)
                    for i in range(len(kfs))]
            poses = optimize_graph(poses, edges, free, iters=5)
            local_err = 0.0
            n_local += 1
            did = True
        if did:
            for k, p in zip(kfs, poses):
                k.pose = p
            pose = kfs[-1].pose.copy()   # tracker->adjust (pose_graph.cpp:298)

    # final global optimize (pose_graph.h:73-96)
    if len(kfs) > 1:
        poses = optimize_graph([k.pose for k in kfs], edges,
                               [i != 0 for i in range(len(kfs))], iters=10)
        for k, p in zip(kfs, poses):
            k.pose = p
    wall = time.time() - t0
    fps = (args.frames - 1) / wall

    est = []
    for p, (kid, T_rel) in zip(traj, anchors):
        est.append(p if kid < 0 else kfs[kid].pose @ T_rel)
    est = np.stack(est)

    from semantic_slam_mapping_tpu.utils import metrics
    ate = metrics.absolute_trajectory_error(est, gt)
    rpe_t, rpe_r = metrics.relative_pose_error(est, gt)
    rec = {
        "metric": "cpu_reference_golden",
        "frames": args.frames, "seed": args.seed,
        "ate_rmse_m": round(float(ate.rmse), 4),
        "rpe_trans_rmse_m": round(float(rpe_t.rmse), 4),
        "rpe_rot_rmse_deg": round(float(np.degrees(rpe_r.rmse)), 4),
        "keyframes": len(kfs), "edges": len(edges),
        "loop_edges": n_loop_edges,
        "global_optimizations": n_global,
        "local_optimizations": n_local,
        "fps": round(fps, 3),
        "method": "OpenCV SGBM/GFTT/KLT/RANSAC-GN-VO frontend + ORB/"
                  "PnP-RANSAC edges + numpy-LM pose graph at reference "
                  "parameters; exhaustive loop scan (no BoW gate)",
    }
    print(json.dumps(rec), flush=True)
    if args.write:
        path = REPO / "BASELINE_MEASURED.json"
        base = json.loads(path.read_text()) if path.exists() else {}
        base["cpu_golden"] = rec
        path.write_text(json.dumps(base, indent=2) + "\n")
        print(f"# wrote {path}")


if __name__ == "__main__":
    main()
