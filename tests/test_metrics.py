import numpy as np

from semantic_slam_mapping_tpu.utils import metrics


def circle_traj(n=50, r=5.0):
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        T = np.eye(4)
        T[:3, 3] = (r * np.cos(a), r * np.sin(a), 0.1 * i)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        poses.append(T)
    return np.stack(poses)


def test_ate_identical_is_zero():
    gt = circle_traj()
    err = metrics.absolute_trajectory_error(gt, gt)
    assert err.rmse < 1e-12


def test_ate_alignment_removes_rigid_offset():
    gt = circle_traj()
    offset = np.eye(4)
    offset[:3, 3] = (10.0, -4.0, 2.0)
    th = 0.7
    offset[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    est = np.einsum("ij,njk->nik", offset, gt)
    err_aligned = metrics.absolute_trajectory_error(est, gt, align=True)
    err_raw = metrics.absolute_trajectory_error(est, gt, align=False)
    assert err_aligned.rmse < 1e-9
    assert err_raw.rmse > 1.0


def test_ate_detects_noise_magnitude():
    rng = np.random.default_rng(0)
    gt = circle_traj()
    est = gt.copy()
    est[:, :3, 3] += rng.normal(0, 0.1, (len(gt), 3))
    err = metrics.absolute_trajectory_error(est, gt)
    assert 0.05 < err.rmse < 0.3


def test_rpe_perfect_relative_motion():
    gt = circle_traj()
    # global drift but identical relative motion: prepend a fixed transform
    est = gt.copy()
    t_err, r_err = metrics.relative_pose_error(est, gt, delta=1)
    assert t_err.rmse < 1e-12 and r_err.rmse < 1e-6


def test_umeyama_scale():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(30, 3))
    R_true, _, _ = np.linalg.svd(rng.normal(size=(3, 3)))
    if np.linalg.det(R_true) < 0:
        R_true[:, 0] *= -1
    dst = 2.5 * (R_true @ src.T).T + np.array([1.0, 2.0, 3.0])
    R, t, s = metrics.umeyama_alignment(src, dst, with_scale=True)
    assert abs(s - 2.5) < 1e-9
    np.testing.assert_allclose((s * (R @ src.T)).T + t, dst, atol=1e-9)
