#!/usr/bin/env python
"""Measured CPU anchor: the reference frontend re-run faithfully on the host.

VERDICT.md round-1 item 1(a) requires *measuring* the reference-equivalent
CPU pipeline instead of the round-1 5.0 fps estimate.  This script executes
the per-frame hot loop of the reference's segnet-slam main thread
(SURVEY.md §3.1) with the reference's own components — OpenCV StereoSGBM,
GFTT, pyramidal KLT, KalmanFilter, floodFill, fitLine — at the reference's
exact parameters, plus vectorised numpy for the stages the reference writes
as scalar C++ loops (triangulate10D, RANSAC VO normal equations, mask
back-projection).  Vectorised numpy is *faster* than the reference's
per-pixel C++, so the anchor errs high (harder to beat), never low.

Per-frame stages, mirroring /root/reference/src/track.cpp:38-137:
  1. SGBM disparity            (stereo.cpp:11-38; fullDP -> MODE_HH, 8 dirs)
  2. GFTT detect               (quadmatcher.cpp:301-308: quality .04, dist 8)
  3. 4x pyramidal KLT + gates  (quadmatcher.cpp:548-588, 420-503)
  4. RANSAC x GN stereo VO     (vo_stereo.cpp:91-136: 200 hyp x <=20 GN)
  5. triangulate10D            (stereo.cpp:41-118)
  6. U-V-disparity moving mask (uvdisparity.cpp:842-903)

ORB extraction (track.cpp:42) is deliberately excluded: it feeds the
keyframe/loop path, which bench.py's TPU frontend number also excludes —
both sides of the vs_baseline ratio measure the same work.

Run:  python baselines/cpu_reference.py [--frames 8] [--write]
`--write` records the measured fps as `cpu_fps` in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time
from collections import defaultdict
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parents[1]

H, W = 376, 1248          # bench.py operating shape (KITTI-like)
D_MAX = 80                # numberOfDisparities (stereo.cpp:18)
FOCAL, CU, CV_, BASE = 718.856, 607.1928, 185.2157, 0.53716572


# --------------------------------------------------------------------------
# 1. SGBM — reference parameters verbatim (stereo.cpp:16-28), fullDP mode
#    (the 2.4.x `sgbm.fullDP` flag the reference leaves at its tuned value
#    maps to MODE_HH in modern OpenCV: 8 aggregation directions).
# --------------------------------------------------------------------------
SGBM = cv2.StereoSGBM_create(
    minDisparity=0, numDisparities=D_MAX, blockSize=11,
    P1=4 * 1 * 11 * 11, P2=32 * 1 * 11 * 11,
    disp12MaxDiff=1, preFilterCap=63, uniquenessRatio=10,
    speckleWindowSize=100, speckleRange=32,
    mode=cv2.STEREO_SGBM_MODE_HH)


def sgbm(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    return SGBM.compute(left, right)          # int16, x16 fixed point


# --------------------------------------------------------------------------
# 2-3. GFTT + circular KLT (quadmatcher.cpp:548-588) + filteringTracks gates
#      (quadmatcher.cpp:420-503) — parameters verbatim.
# --------------------------------------------------------------------------
KLT_KW = dict(winSize=(11, 11), maxLevel=3,
              criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                        200, 0.01),
              flags=cv2.OPTFLOW_LK_GET_MIN_EIGENVALS,
              minEigThreshold=1e-6)


def gftt(img: np.ndarray) -> np.ndarray:
    pts = cv2.goodFeaturesToTrack(img, maxCorners=1000, qualityLevel=0.04,
                                  minDistance=8)
    return (np.zeros((0, 1, 2), np.float32) if pts is None
            else pts.astype(np.float32))


def circular_klt(lc, rc, lp, rp, pt_lc):
    pt_rc, _, _ = cv2.calcOpticalFlowPyrLK(lc, rc, pt_lc, None, **KLT_KW)
    pt_rp, _, _ = cv2.calcOpticalFlowPyrLK(rc, rp, pt_rc, None, **KLT_KW)
    pt_lp, _, _ = cv2.calcOpticalFlowPyrLK(rp, lp, pt_rp, None, **KLT_KW)
    pt_lpd, _, _ = cv2.calcOpticalFlowPyrLK(lc, lp, pt_lc, None, **KLT_KW)

    a = pt_lc[:, 0]
    b = pt_rc[:, 0]
    c = pt_lp[:, 0]
    d = pt_rp[:, 0]
    e = pt_lpd[:, 0]
    rnd = np.rint
    inside = lambda p: ((p[:, 0] >= 0) & (p[:, 0] < 1280) &   # noqa: E731
                        (p[:, 1] >= 0) & (p[:, 1] < 960))
    keep = (inside(a) & inside(b) & inside(c) & inside(d)
            & (rnd(np.abs(a[:, 1] - b[:, 1])) < 20)
            & (rnd(np.abs(c[:, 1] - d[:, 1])) < 20)
            & (rnd(np.abs(a[:, 1] - c[:, 1])) < 30)
            & (rnd(np.abs(b[:, 1] - d[:, 1])) < 30)
            & (rnd(np.abs(a[:, 0] - c[:, 0])) < 200)
            & (rnd(np.abs(b[:, 0] - d[:, 0])) < 200)
            & (rnd(np.abs(a[:, 0] - b[:, 0])) > 3)
            & (rnd(np.abs(c[:, 0] - d[:, 0])) > 3)
            & (rnd(np.abs(c[:, 0] - e[:, 0])) < 1)
            & (rnd(np.abs(c[:, 1] - e[:, 1])) < 1))
    return a[keep], b[keep], c[keep], d[keep]


# --------------------------------------------------------------------------
# 4. RANSAC x Gauss-Newton stereo VO (vo_stereo.cpp:47-152).  The reference
#    runs 200 sequential {3-pt sample, <=20 GN iters} loops; here the 200
#    hypotheses are batched in numpy (faster per-iteration than 200 C++
#    loops of 6x6 solves — anchor errs high).
# --------------------------------------------------------------------------
def _rot_and_derivs(rx, ry, rz):
    """R = Rx@Ry@Rz (libviso2 convention, vo_stereo.cpp:243-273) plus the
    three analytic derivatives dR/drx, dR/dry, dR/drz.  Batched (B,3,3)."""
    B = rx.shape[0]
    z, o = np.zeros(B), np.ones(B)

    def mat(rows):
        return np.stack([np.stack(r, -1) for r in rows], -2)

    sx, cx = np.sin(rx), np.cos(rx)
    sy, cy = np.sin(ry), np.cos(ry)
    sz, cz = np.sin(rz), np.cos(rz)
    Rx = mat([[o, z, z], [z, cx, -sx], [z, sx, cx]])
    Ry = mat([[cy, z, sy], [z, o, z], [-sy, z, cy]])
    Rz = mat([[cz, -sz, z], [sz, cz, z], [z, z, o]])
    dRx = mat([[z, z, z], [z, -sx, -cx], [z, cx, -sx]])
    dRy = mat([[-sy, z, cy], [z, z, z], [-cy, z, -sy]])
    dRz = mat([[-sz, -cz, z], [cz, -sz, z], [z, z, z]])
    Ryz = Ry @ Rz
    R = Rx @ Ryz
    return R, (dRx @ Ryz, Rx @ dRy @ Rz, Rx @ Ry @ dRz)


def _project(params, X, with_jac=False):
    """params (B,6) [rx ry rz tx ty tz]; X (B,N,3) previous-frame points.
    Returns predicted (B,N,4) [u1c v1c u2c v2c] and, if with_jac, the
    analytic (B,N,4,6) Jacobian (vo_stereo.cpp:275-365)."""
    R, dRs = _rot_and_derivs(params[:, 0], params[:, 1], params[:, 2])
    Xc = np.einsum("bij,bnj->bni", R, X) + params[:, None, 3:6]
    Z = np.maximum(Xc[..., 2], 1e-6)
    x, y = Xc[..., 0], Xc[..., 1]
    u1 = FOCAL * x / Z + CU
    v1 = FOCAL * y / Z + CV_
    u2 = FOCAL * (x - BASE) / Z + CU
    pred = np.stack([u1, v1, u2, v1], axis=-1)
    if not with_jac:
        return pred
    # dXc/dp: rotations via dR@X, translations via e_k
    dXc = np.empty(Xc.shape[:2] + (3, 6))
    for k in range(3):
        dXc[..., k] = np.einsum("bij,bnj->bni", dRs[k], X)
    dXc[..., 3:] = np.broadcast_to(np.eye(3), Xc.shape[:2] + (3, 3))
    fZ = FOCAL / Z
    du1 = fZ[..., None] * (dXc[:, :, 0] - (x / Z)[..., None] * dXc[:, :, 2])
    dv1 = fZ[..., None] * (dXc[:, :, 1] - (y / Z)[..., None] * dXc[:, :, 2])
    du2 = fZ[..., None] * (dXc[:, :, 0]
                           - ((x - BASE) / Z)[..., None] * dXc[:, :, 2])
    J = np.stack([du1, dv1, du2, dv1], axis=-2)   # (B,N,4,6)
    return pred, J


def _gn_steps(params, X, obs, n_iters):
    """Batched Gauss-Newton with the analytic Jacobian (one linearisation +
    6x6 solve per iteration, same as the reference's inner loop)."""
    for _ in range(n_iters):
        pred, J = _project(params, X, with_jac=True)
        r = obs - pred
        A = np.einsum("bnrk,bnrl->bkl", J, J)
        b = np.einsum("bnrk,bnr->bk", J, r)
        A += 1e-8 * np.eye(6)
        try:
            params = params + np.linalg.solve(A, b[..., None])[..., 0]
        except np.linalg.LinAlgError:
            break
    return params


def vo_ransac(u1c, v1c, u2c, u1p, v1p, u2p, rng):
    n = u1c.shape[0]
    if n < 6:
        return None
    d = np.maximum(u1p - u2p, 0.5)
    Z = FOCAL * BASE / d
    X = np.stack([(u1p - CU) * Z / FOCAL, (v1p - CV_) * Z / FOCAL, Z], -1)
    obs = np.stack([u1c, v1c, u2c, v1c], -1)

    samples = rng.integers(0, n, size=(200, 3))
    params = _gn_steps(np.zeros((200, 6)), X[samples], obs[samples], 20)
    pred = _project(params, np.broadcast_to(X, (200,) + X.shape))
    err = ((obs[None] - pred) ** 2).sum(-1)
    inl = err < 6.0 ** 2                     # parameters.txt:79
    best = int(np.argmax(inl.sum(1)))
    mask = inl[best]
    if mask.sum() < 6:
        return None
    final = _gn_steps(params[best][None], X[mask][None], obs[mask][None],
                      100)[0]
    err_f = ((obs - _project(final[None], X[None])[0]) ** 2).sum(-1)
    return final, err_f < 6.0 ** 2


# --------------------------------------------------------------------------
# 5. triangulate10D (stereo.cpp:41-118): HxWx10 [X Y Z u v d I Iu Iv motion]
#    with ROI gating.  Vectorised (reference is a per-pixel loop).
# --------------------------------------------------------------------------
ROI = (30.0, 3.0, 40.0)   # x/y/z half-extents (basicStructure.hpp:15-38)


def triangulate10d(img, disp16):
    d = disp16.astype(np.float32) / 16.0
    valid = d > 0
    dsafe = np.where(valid, d, 1.0)
    Z = FOCAL * BASE / dsafe
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    Xw = (u - CU) * Z / FOCAL
    Yw = (v - CV_) * Z / FOCAL
    roi = (valid & (np.abs(Xw) < ROI[0]) & (np.abs(Yw) < ROI[1])
           & (Z > 0) & (Z < ROI[2]))
    gy, gx = np.gradient(img.astype(np.float32))
    xyz = np.stack([Xw, Yw, Z, u, v, d, img.astype(np.float32), gx, gy,
                    roi.astype(np.float32)], axis=-1)
    return xyz, roi


# --------------------------------------------------------------------------
# 6. U-V-disparity (uvdisparity.cpp:842-903): V-hist -> pitch (Otsu +
#    fitLine) -> 2 Kalman filters -> point correction -> U-hist + sigmoid ->
#    floodFill per VO outlier -> merge/verify -> band back-projection.
# --------------------------------------------------------------------------
def _make_kf():
    kf = cv2.KalmanFilter(2, 1)
    kf.transitionMatrix = np.array([[1, 1], [0, 1]], np.float32)
    kf.measurementMatrix = np.array([[1, 0]], np.float32)
    kf.processNoiseCov = 1e-5 * np.eye(2, dtype=np.float32)
    kf.measurementNoiseCov = np.array([[1e-2]], np.float32)
    kf.errorCovPost = np.eye(2, dtype=np.float32)
    return kf


KF1, KF2 = _make_kf(), _make_kf()


def _pitch_from_vhist(vhist):
    blur = cv2.GaussianBlur(vhist, (3, 3), 0)
    er = cv2.erode(blur, np.ones((2, 2), np.uint8))
    _, bw = cv2.threshold(er.astype(np.uint8), 0, 255,
                          cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    ys, xs = [], []
    for col in range(bw.shape[1]):          # column-bottom picking
        nz = np.flatnonzero(bw[:, col])
        if nz.size:
            ys.append(nz[-1])
            xs.append(col)
    if len(xs) < 4:
        return 0.0, 0.0
    line = cv2.fitLine(np.stack([xs, ys], 1).astype(np.float32),
                       cv2.DIST_L2, 0, 0.01, 0.01).ravel()
    vx, vy, x0, y0 = line
    v_at_0 = y0 - x0 * (vy / max(vx, 1e-6))
    pitch1 = float(np.arctan2(v_at_0 - CV_, FOCAL))
    pitch2 = float(np.arctan2(vy, vx)) * 0.1
    return pitch1, pitch2


def uv_disparity(img, disp16, xyz, roi, inlier_uv, outlier_uv):
    d = np.clip(disp16.astype(np.int32) // 16, 0, D_MAX - 1)
    valid = (disp16 > 0) & roi

    vhist = np.zeros((H, D_MAX), np.float32)
    rows = np.repeat(np.arange(H), W).reshape(H, W)
    np.add.at(vhist, (rows[valid], d[valid]), 1.0)

    p1, p2 = _pitch_from_vhist(vhist)
    for kf, m in ((KF1, p1), (KF2, p2)):
        kf.predict()
        kf.correct(np.array([[m]], np.float32))
    p1s = float(KF1.statePost[0, 0])

    # correct3DPoints (stereo.cpp:127-181): rotate Y/Z by smoothed pitch
    cp, sp = np.cos(p1s), np.sin(p1s)
    Y, Z = xyz[..., 1], xyz[..., 2]
    xyz[..., 1] = cp * Y - sp * Z
    xyz[..., 2] = sp * Y + cp * Z
    roi2 = roi & (np.abs(xyz[..., 1]) < ROI[1])

    ground = roi2 & (xyz[..., 1] > 0.5 * ROI[1])
    uhist = np.zeros((D_MAX, W), np.float32)
    m = valid & roi2 & ~ground
    cols = np.tile(np.arange(W), (H, 1))
    np.add.at(uhist, (d[m], cols[m]), 1.0)
    uimg = (255.0 / (1.0 + np.exp(-0.02 * (uhist - 32.0)))).astype(np.uint8)

    masks = []
    uflood = uimg.copy()
    for (u, v) in outlier_uv[:40]:
        ui, di = int(u), int(d[int(v), int(u)])
        if di < 3 or uflood[di, ui] < 11:
            continue
        ff_mask = np.zeros((D_MAX + 2, W + 2), np.uint8)
        area, _, _, rect = cv2.floodFill(
            uflood, ff_mask, (ui, di), 0, loDiff=8, upDiff=8,
            flags=cv2.FLOODFILL_FIXED_RANGE)
        if area >= 20:
            masks.append((rect, ff_mask[1:-1, 1:-1] > 0))

    # merge by rect overlap; verify by inlier count (<=3 tolerated)
    kept = []
    for rect, mk in masks:
        x, y, w_, h_ = rect
        n_inl = sum(1 for (u, v) in inlier_uv
                    if x <= u < x + w_ and y <= d[int(v), int(u)] < y + h_)
        if n_inl <= 3:
            kept.append(mk)

    moving = np.zeros((H, W), bool)
    for mk in kept:                          # disparity-band back-projection
        moving |= valid & mk[d, cols]
    return moving


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------
def render_frames(n_frames: int):
    """Same synthetic sequence bench.py uses, rendered once (untimed)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import sys
    sys.path.insert(0, str(REPO))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from semantic_slam_mapping_tpu.config import SlamConfig
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic

    K = Intrinsics.from_config(SlamConfig().camera)
    world = synthetic.make_world(jax.random.PRNGKey(0), n_boxes=14)
    poses = synthetic.straight_trajectory(n_frames + 1, speed=0.8)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    to8 = lambda a: np.asarray(np.clip(a * 255, 0, 255), np.uint8)  # noqa
    return to8(seq["left"]), to8(seq["right"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    lefts, rights = render_frames(args.frames + 1)
    rng = np.random.default_rng(0)
    stage_t = defaultdict(float)

    # one warmup frame (OpenCV lazy init)
    _ = sgbm(lefts[0], rights[0])

    t_total0 = time.perf_counter()
    for i in range(1, args.frames + 1):
        lc, rc, lp, rp = lefts[i], rights[i], lefts[i - 1], rights[i - 1]

        t0 = time.perf_counter()
        disp = sgbm(lc, rc)
        stage_t["sgbm"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        pts = gftt(lc)
        stage_t["gftt"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        a, b, c, dd = circular_klt(lc, rc, lp, rp, pts)
        stage_t["klt"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        res = vo_ransac(a[:, 0], a[:, 1], b[:, 0], c[:, 0], c[:, 1],
                        dd[:, 0], rng)
        stage_t["vo"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        xyz, roi = triangulate10d(lc, disp)
        stage_t["triangulate"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        if res is not None:
            _, inl = res
            inlier_uv = a[inl]
            outlier_uv = a[~inl]
        else:
            inlier_uv, outlier_uv = a[:0], a
        _ = uv_disparity(lc, disp, xyz, roi, inlier_uv, outlier_uv)
        stage_t["uvdisparity"] += time.perf_counter() - t0

    total = time.perf_counter() - t_total0
    fps = args.frames / total

    print(f"# host: {platform.processor() or platform.machine()}, "
          f"{os.cpu_count()} cpus, opencv {cv2.__version__}")
    for k, v in stage_t.items():
        print(f"# {k:12s} {1e3 * v / args.frames:8.1f} ms/frame")
    print(f"# total        {1e3 * total / args.frames:8.1f} ms/frame")
    print(json.dumps({"metric": "cpu_reference_frames_per_s",
                      "value": round(fps, 3), "unit": "frames/s"}))

    if args.write:
        path = REPO / "BASELINE_MEASURED.json"
        rec = json.loads(path.read_text()) if path.exists() else {}
        rec.update({
            "metric": "frontend_frames_per_s",
            "cpu_fps": round(fps, 4),
            "cpu_fps_method": (
                "MEASURED: baselines/cpu_reference.py — reference frontend "
                "(SGBM MODE_HH 80 disp + GFTT + 4x pyramidal KLT + gates + "
                "200-hyp RANSAC GN VO + triangulate10D + U-V-disparity) via "
                "OpenCV %s at reference parameters (stereo.cpp:16-28, "
                "quadmatcher.cpp:548-588, vo_stereo.hpp:25-40) on %d-cpu "
                "host, %d frames of the bench.py synthetic sequence at "
                "%dx%d" % (cv2.__version__, os.cpu_count(), args.frames,
                           H, W)),
            "cpu_stage_ms": {k: round(1e3 * v / args.frames, 1)
                             for k, v in stage_t.items()},
            "frames": args.frames,
        })
        path.write_text(json.dumps(rec, indent=2) + "\n")
        print(f"# wrote {path}")


if __name__ == "__main__":
    main()
