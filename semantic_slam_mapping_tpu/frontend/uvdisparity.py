"""U-V-disparity ground-plane estimation and moving-object detection.

TPU-native rebuild of the reference's largest component, ``UVDisparity``
(reference: src/uvdisparity.cpp, 1004 LoC; entry ``Process`` at
uvdisparity.cpp:842-903):

1. V-disparity histogram (calVDisparity, :277-366)    -> scatter-add
2. Ground pitch from the V-disparity ground line (Pitch_Classify,
   :368-528: blur + threshold + per-column bottom point + cv::fitLine)
   -> masked weighted least-squares line fit; two pitch angles
   theta = atan((v0 - cy)/fy), each smoothed by a 2-state Kalman filter
   (:35-47, 854-858)
3. 3D point pitch correction (geometry.stereo.correct_pitch)
4. Inlier/outlier re-filter vs the 3D ROI (filterInOut, :68-190)
5. U-disparity histogram over ROI pixels (calUDisparity, :195-274) with
   sigmoid intensity adjustment (adjustUdisIntense :807-837, sigmoid
   :991-1003)
6. Moving-object segmentation: the reference flood-fills the U-disparity
   image from each VO-outlier seed, merges overlapping masks, and rejects
   masks containing too many VO inliers (findAllMasks :534-619, mergeMasks
   :780-804, verifyByInliers :680-731). Here: one connected-component
   labelling of the thresholded U-disparity; a component is *moving* iff it
   contains >= 1 outlier seed, has >= min_area support, and contains fewer
   than ``inlier_tolerance`` inlier seeds — same decision surface, computed
   for all components at once with scatter-adds instead of sequential
   flood fills (components are maximal, so the reference's overlap-merge
   step is subsumed).
7. Back-projection to the image: pixel (u, v) is moving iff its
   (disparity-bin, u) cell belongs to a moving component (segmentation,
   :906-963 — disparity-band membership).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import CameraConfig, UVDisparityConfig
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.ops import image as im
from semantic_slam_mapping_tpu.ops.components import connected_components


class PitchKalmanState(NamedTuple):
    """2-state (angle, angular-rate) Kalman filter state for one pitch
    (reference: cv::KalmanFilter(2, 1) at uvdisparity.cpp:35-47)."""

    x: jnp.ndarray   # (2,) state
    P: jnp.ndarray   # (2, 2) covariance

    @classmethod
    def init(cls, error_cov_post: float = 1.0) -> "PitchKalmanState":
        """error_cov_post: initial posterior covariance scale (the
        reference's KF errorCovPost init, uvdisparity.cpp:35-47;
        UVDisparityConfig.kf_error_cov_post)."""
        return cls(x=jnp.zeros(2), P=error_cov_post * jnp.eye(2))


def pitch_kalman_update(state: PitchKalmanState, measurement: jnp.ndarray,
                        cfg: UVDisparityConfig) -> PitchKalmanState:
    F = jnp.array([[1.0, 1.0], [0.0, 1.0]])
    Hm = jnp.array([[1.0, 0.0]])
    Q = cfg.kf_process_noise * jnp.eye(2)
    R = jnp.array([[cfg.kf_measurement_noise]])
    x = F @ state.x
    P = F @ state.P @ F.T + Q
    y = measurement - Hm @ x
    S = Hm @ P @ Hm.T + R
    Kg = P @ Hm.T / S[0, 0]
    x = x + (Kg * y).reshape(2)
    P = (jnp.eye(2) - Kg @ Hm) @ P
    return PitchKalmanState(x=x, P=P)


class UVResult(NamedTuple):
    moving_mask: jnp.ndarray    # (H, W) bool — the frame's moving-object mask
    pitch: jnp.ndarray          # scalar: measured ground pitch (rad)
    horizon_row: jnp.ndarray    # scalar: v at disparity 0 of the ground line
    ground_mask: jnp.ndarray    # (H, W) bool — pixels near the ground line
    u_disparity: jnp.ndarray    # (D, W) adjusted U-disparity (debug/metrics)
    inlier_roi: jnp.ndarray     # (N,) inliers re-filtered by ROI
    outlier_roi: jnp.ndarray    # (N,) outliers re-filtered by ROI


def v_disparity(disparity: jnp.ndarray, valid: jnp.ndarray,
                num_disparities: int) -> jnp.ndarray:
    """(H, W) disparity -> (H, D) row histogram via scatter-add
    (calVDisparity, uvdisparity.cpp:277-366)."""
    H, W = disparity.shape
    d = jnp.clip(disparity.astype(jnp.int32), 0, num_disparities - 1)
    rows = jnp.broadcast_to(jnp.arange(H)[:, None], (H, W))
    hist = jnp.zeros((H, num_disparities), jnp.float32)
    return hist.at[rows.reshape(-1), d.reshape(-1)].add(
        valid.reshape(-1).astype(jnp.float32))


def u_disparity(disparity: jnp.ndarray, mask: jnp.ndarray,
                num_disparities: int) -> jnp.ndarray:
    """(H, W) disparity -> (D, W) column histogram over ``mask`` pixels
    (calUDisparity, uvdisparity.cpp:195-274)."""
    H, W = disparity.shape
    d = jnp.clip(disparity.astype(jnp.int32), 0, num_disparities - 1)
    cols = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))
    hist = jnp.zeros((num_disparities, W), jnp.float32)
    return hist.at[d.reshape(-1), cols.reshape(-1)].add(
        mask.reshape(-1).astype(jnp.float32))


def fit_ground_line(vdisp: jnp.ndarray,
                    cfg: UVDisparityConfig = UVDisparityConfig()
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit the ground line v = a*d + b to the V-disparity.

    The reference blurs/erodes, Otsu-thresholds, then picks the bottom-most
    above-threshold row per disparity column and least-squares fits
    (Pitch_Classify, uvdisparity.cpp:368-528). Same here, vectorized:
    per-column bottom-most strong bin -> weighted least squares. The blur
    kernel width (v_blur_ksize, GaussianBlur at uvdisparity.cpp:400) and
    Otsu histogram resolution (otsu_bins) come from cfg."""
    H, D = vdisp.shape
    radius = max(1, cfg.v_blur_ksize // 2)
    sm = im.gaussian_blur(vdisp, sigma=max(0.5, cfg.v_blur_ksize / 3.0),
                          radius=radius)
    th = im.otsu_threshold(sm, n_bins=cfg.otsu_bins,
                           value_range=(0.0, jnp.max(sm) + 1e-6))
    strong = sm > jnp.maximum(th, 1.0)
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    # intensity-weighted centroid row of the strong band, restricted to the
    # lower half of the band (the ground dominates below obstacles). The
    # reference picks the single bottom-most point, which biases the
    # intercept by the band half-width; the weighted centroid is unbiased.
    col_max = jnp.max(jnp.where(strong, rows, -1.0), axis=0)  # (D,)
    lower_half = rows >= (col_max[None, :] - 4.0)
    wgt = jnp.where(strong & lower_half, sm, 0.0)
    col_w = jnp.sum(wgt, axis=0)
    v_bot = jnp.sum(wgt * rows, axis=0) / jnp.maximum(col_w, 1e-6)
    w = (col_w > 0).astype(jnp.float32)
    # ignore the d=0 column (invalid disparities pile up there)
    w = w.at[0].set(0.0)
    ds = jnp.arange(D, dtype=jnp.float32)
    sw = jnp.sum(w) + 1e-6
    mx = jnp.sum(w * ds) / sw
    my = jnp.sum(w * v_bot) / sw
    cov = jnp.sum(w * (ds - mx) * (v_bot - my)) / sw
    var = jnp.sum(w * (ds - mx) ** 2) / sw
    a = cov / jnp.maximum(var, 1e-6)
    b = my - a * mx
    return a, b


def ground_pitch(K: Intrinsics, horizon_row: jnp.ndarray) -> jnp.ndarray:
    """theta = atan((v0 - cy) / fy): ground-line intercept at d=0 is the
    horizon; its offset from the principal row is the camera pitch
    (uvdisparity.cpp Pitch_Classify semantics)."""
    return jnp.arctan2(horizon_row - K.cy, K.fy)


def sigmoid_adjust(u_disp: jnp.ndarray, cfg: UVDisparityConfig) -> jnp.ndarray:
    """Sigmoid contrast stretch of the U-disparity intensities
    (adjustUdisIntense uvdisparity.cpp:807-837, sigmoid :991-1003:
    s(x) = 255 / (1 + exp(-alpha*(x - beta))))."""
    return 255.0 / (1.0 + jnp.exp(-cfg.sigmoid_alpha
                                  * (u_disp * 255.0 / 8.0 - cfg.sigmoid_beta)))


def measure_pitch(disparity: jnp.ndarray, valid: jnp.ndarray,
                  roi: jnp.ndarray, K: Intrinsics,
                  num_disparities: int,
                  cfg: UVDisparityConfig = UVDisparityConfig()
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """V-disparity ground-line fit -> (pitch measurement, line a, line b).

    This is the reference's Pitch_Classify stage (uvdisparity.cpp:368-528)
    pulled out of the detection pass so the caller can run the Kalman
    filter on the measurement and feed the *smoothed* pitch back into
    correct3DPoints-style point rectification BEFORE U-disparity — matching
    the reference's Process order (uvdisparity.cpp:842-874: measure ->
    KF predict/correct -> correct3DPoints(statePost) -> re-filter ROI ->
    calUDisparity). The reference smooths two angles but correct3DPoints
    consumes only pitch1 (stereo.cpp:127-135: only cos_p1/sin_p1 appear),
    so one filter suffices."""
    vd = v_disparity(disparity, valid & roi, num_disparities)
    a, b = fit_ground_line(vd, cfg)
    return ground_pitch(K, b), a, b


@partial(jax.jit, static_argnames=("cfg", "num_disparities"))
def detect_moving_objects(
        disparity: jnp.ndarray, valid: jnp.ndarray, roi: jnp.ndarray,
        inlier_uv: jnp.ndarray, inlier_valid: jnp.ndarray,
        outlier_uv: jnp.ndarray, outlier_valid: jnp.ndarray,
        K: Intrinsics, num_disparities: int = 80,
        cfg: UVDisparityConfig = UVDisparityConfig(),
        line_ab: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        ) -> UVResult:
    """Full U-V-disparity pass for one frame.

    inlier_uv/outlier_uv: (N, 2) current-left pixel positions of the VO
    inlier and outlier matches (the reference feeds VO in/outliers to seed
    and veto segmentation, uvdisparity.cpp:842-903).

    line_ab: optionally the precomputed ground line (a, b) from
    ``measure_pitch`` — pass it (together with a ``roi`` already re-filtered
    through ``geometry.stereo.correct_pitch`` at the Kalman-smoothed pitch)
    to reproduce the reference's pitch-corrected re-filter loop
    (uvdisparity.cpp:854-874). When None, the line is fit here (standalone/
    single-shot use).
    """
    H, W = disparity.shape

    # ---- ground line + pitch from V-disparity ----
    if line_ab is None:
        vd = v_disparity(disparity, valid & roi, num_disparities)
        a, b = fit_ground_line(vd, cfg)
    else:
        a, b = line_ab
    pitch = ground_pitch(K, b)

    # ground mask: pixels within a disparity band of the ground line
    ds = disparity
    v_pred = a * ds + b
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    ground = valid & (jnp.abs(rows - v_pred) < 3.0 + 0.05 * ds)

    # ---- ROI re-filter of VO in/outliers (filterInOut :68-190) ----
    def uv_in_roi(uv, uvv):
        x = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
        y = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
        return uvv & roi[y, x]

    inl_ok = uv_in_roi(inlier_uv, inlier_valid)
    out_ok = uv_in_roi(outlier_uv, outlier_valid)

    # ---- U-disparity over obstacle (non-ground, in-ROI) pixels ----
    obstacle = valid & roi & ~ground
    ud = u_disparity(disparity, obstacle, num_disparities)
    ud_adj = sigmoid_adjust(ud, cfg)

    # ---- segmentation: components of the strong U-disparity ----
    # threshold on raw histogram support (pixel rows of evidence in the
    # column); the sigmoid-adjusted image is for visualization parity
    strong = ud >= cfg.min_intensity
    conn = lambda ax, sh: jnp.roll(strong, sh, ax)
    lbl = connected_components(
        strong, (conn(0, 1), conn(0, -1), conn(1, 1), conn(1, -1)),
        sweeps=cfg.flood_fill_sweeps)

    D = num_disparities
    n_cells = D * W

    def seed_cells(uv, ok):
        """Map feature pixels to their (d_bin, u) U-disparity cell."""
        x = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
        y = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
        d = jnp.clip(disparity[y, x].astype(jnp.int32), 0, D - 1)
        cell_ok = ok & (disparity[y, x] > cfg.min_disparity_raw) \
            & strong[d, x]
        return d * W + x, cell_ok

    out_cell, out_cell_ok = seed_cells(outlier_uv, out_ok)
    inl_cell, inl_cell_ok = seed_cells(inlier_uv, inl_ok)

    # per-component statistics via scatter-add on labels
    flat_lbl = lbl.reshape(-1)
    comp_area = jnp.zeros(n_cells, jnp.float32).at[flat_lbl].add(
        strong.reshape(-1).astype(jnp.float32))
    # mass = histogram support (pixels of image, not cells)
    comp_mass = jnp.zeros(n_cells, jnp.float32).at[flat_lbl].add(
        jnp.where(strong, ud, 0.0).reshape(-1))
    out_counts = jnp.zeros(n_cells, jnp.int32).at[
        flat_lbl[out_cell]].add(out_cell_ok.astype(jnp.int32))
    inl_counts = jnp.zeros(n_cells, jnp.int32).at[
        flat_lbl[inl_cell]].add(inl_cell_ok.astype(jnp.int32))

    moving_comp = ((out_counts >= 1)
                   & (inl_counts < cfg.inlier_tolerance)
                   & (comp_area >= cfg.min_area))

    # ---- back-projection (segmentation :906-963) ----
    d_bin = jnp.clip(disparity.astype(jnp.int32), 0, D - 1)
    cols = jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))
    pix_lbl = lbl[d_bin, cols]
    pix_strong = strong[d_bin, cols]
    moving = (valid & roi & ~ground & pix_strong & moving_comp[pix_lbl]
              & (disparity > cfg.min_disparity_raw))

    return UVResult(moving_mask=moving, pitch=pitch, horizon_row=b,
                    ground_mask=ground, u_disparity=ud_adj,
                    inlier_roi=inl_ok, outlier_roi=out_ok)
