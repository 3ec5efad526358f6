"""Trajectory accuracy metrics: ATE and RPE.

The reference has NO numeric trajectory metrics — accuracy was judged by
eyeballing GT-overlay plots (reference: experiment/run_tracker.cpp:50-63,
experiment/test_pnp.cpp:61-74; SURVEY.md §4). This harness is the standard
TUM-benchmark formulation: ATE after Horn/Umeyama SE(3) (optionally Sim(3))
alignment; RPE over fixed-delta relative poses.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class TrajectoryError(NamedTuple):
    rmse: float
    mean: float
    median: float
    maximum: float

    def __repr__(self) -> str:  # compact for logs
        return (f"TrajErr(rmse={self.rmse:.4f}, mean={self.mean:.4f}, "
                f"median={self.median:.4f}, max={self.maximum:.4f})")


def _stats(errors: np.ndarray) -> TrajectoryError:
    return TrajectoryError(
        rmse=float(np.sqrt(np.mean(errors ** 2))),
        mean=float(np.mean(errors)),
        median=float(np.median(errors)),
        maximum=float(np.max(errors)),
    )


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares rigid (or similarity) transform aligning src -> dst.
    src, dst: (N, 3). Returns (R, t, s)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def absolute_trajectory_error(est: np.ndarray, gt: np.ndarray,
                              align: bool = True,
                              with_scale: bool = False) -> TrajectoryError:
    """ATE over translation. est, gt: (N, 4, 4) poses (camera-to-world)."""
    p_est = est[:, :3, 3]
    p_gt = gt[:, :3, 3]
    if align:
        R, t, s = umeyama_alignment(p_est, p_gt, with_scale)
        p_est = (s * (R @ p_est.T)).T + t
    return _stats(np.linalg.norm(p_est - p_gt, axis=1))


def relative_pose_error(est: np.ndarray, gt: np.ndarray,
                        delta: int = 1) -> tuple[TrajectoryError, TrajectoryError]:
    """RPE at frame-delta ``delta``. Returns (translational (m),
    rotational (rad)) error stats."""
    n = len(est) - delta
    t_err = np.empty(n)
    r_err = np.empty(n)
    for i in range(n):
        d_est = np.linalg.inv(est[i]) @ est[i + delta]
        d_gt = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(d_gt) @ d_est
        t_err[i] = np.linalg.norm(e[:3, 3])
        cos_a = np.clip((np.trace(e[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        r_err[i] = np.arccos(cos_a)
    return _stats(t_err), _stats(r_err)
