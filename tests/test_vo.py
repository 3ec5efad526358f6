import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import CameraConfig, VoConfig
from semantic_slam_mapping_tpu.frontend import vo
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import (Intrinsics,
                                                       project_stereo)

N = 256
CFG = VoConfig(ransac_iters=50, gn_iters_hypothesis=10, gn_iters_refine=30)


def make_matches(key, T_delta, n_outliers=0, noise=0.0):
    """Generate quad matches from random 3D points under known motion.
    T_delta maps previous-camera coords to current-camera coords."""
    K = Intrinsics.from_config(CameraConfig())
    k1, k2, k3 = jax.random.split(key, 3)
    X = jnp.stack([
        jax.random.uniform(k1, (N,), minval=-15.0, maxval=15.0),
        jax.random.uniform(k2, (N,), minval=-2.0, maxval=2.0),
        jax.random.uniform(k3, (N,), minval=5.0, maxval=45.0)], axis=-1)
    obs_p = project_stereo(K, X)                       # previous stereo
    obs_c = project_stereo(K, se3.transform_points(T_delta, X))
    if noise > 0:
        obs_p = obs_p + noise * jax.random.normal(k1, obs_p.shape)
        obs_c = obs_c + noise * jax.random.normal(k2, obs_c.shape)
    lp = obs_p[:, 0:2]
    rp = jnp.stack([obs_p[:, 2], obs_p[:, 3]], -1)
    lc = obs_c[:, 0:2]
    rc = jnp.stack([obs_c[:, 2], obs_c[:, 3]], -1)
    if n_outliers > 0:
        # corrupt the first n_outliers current observations grossly
        shift = 40.0 * jax.random.normal(k3, (n_outliers, 2))
        lc = lc.at[:n_outliers].add(shift)
        rc = rc.at[:n_outliers].add(shift)
    valid = jnp.ones(N, bool)
    return K, vo.QuadMatches(lp=lp, rp=rp, lc=lc, rc=rc, valid=valid)


def check_recovery(T_est, T_true, tol_t=0.01, tol_r=1e-3):
    dt = se3.translation_norm(se3.compose(se3.inverse(T_est), T_true))
    dr = se3.rotation_angle(se3.compose(se3.inverse(T_est), T_true))
    assert float(dt) < tol_t, f"translation error {float(dt)}"
    assert float(dr) < tol_r, f"rotation error {float(dr)}"


def test_vo_exact_recovery():
    T_true = se3.exp(jnp.array([0.05, 0.02, -0.8, 0.01, 0.02, -0.005]))
    K, m = make_matches(jax.random.PRNGKey(0), T_true)
    res = vo.estimate_motion(m, K, jax.random.PRNGKey(1), CFG)
    assert bool(res.success)
    assert int(res.n_inliers) > N * 0.95
    check_recovery(res.T_delta, T_true)


def test_vo_robust_to_outliers():
    T_true = se3.exp(jnp.array([0.0, 0.0, -1.2, 0.0, 0.03, 0.0]))
    K, m = make_matches(jax.random.PRNGKey(2), T_true, n_outliers=N // 3)
    res = vo.estimate_motion(m, K, jax.random.PRNGKey(3), CFG)
    assert bool(res.success)
    # outliers must be excluded
    assert int(res.inliers[:N // 3].sum()) < N // 20
    check_recovery(res.T_delta, T_true, tol_t=0.02, tol_r=2e-3)


def test_vo_with_pixel_noise():
    T_true = se3.exp(jnp.array([0.02, 0.0, -0.9, 0.0, 0.01, 0.0]))
    K, m = make_matches(jax.random.PRNGKey(4), T_true, noise=0.3)
    res = vo.estimate_motion(m, K, jax.random.PRNGKey(5), CFG)
    assert bool(res.success)
    check_recovery(res.T_delta, T_true, tol_t=0.05, tol_r=5e-3)


def test_vo_respects_valid_mask():
    T_true = se3.exp(jnp.array([0.0, 0.0, -0.5, 0.0, 0.0, 0.0]))
    K, m = make_matches(jax.random.PRNGKey(6), T_true)
    # corrupt half the matches but mark them invalid
    lc_bad = m.lc.at[:N // 2].add(100.0)
    m = m._replace(lc=lc_bad, valid=m.valid.at[:N // 2].set(False))
    res = vo.estimate_motion(m, K, jax.random.PRNGKey(7), CFG)
    assert bool(res.success)
    assert int(res.inliers[:N // 2].sum()) == 0
    check_recovery(res.T_delta, T_true)


def test_vo_insufficient_matches_fails():
    T_true = se3.identity()
    K, m = make_matches(jax.random.PRNGKey(8), T_true)
    m = m._replace(valid=m.valid.at[4:].set(False))  # only 4 matches
    res = vo.estimate_motion(m, K, jax.random.PRNGKey(9), CFG)
    assert not bool(res.success)


def test_distinct3_never_duplicates():
    """RANSAC samples must use three distinct matches (reference vo.cpp
    getRandomSample): with-replacement draws made rank-deficient
    hypotheses possible exactly when matches are few."""
    keys = jax.random.split(jax.random.PRNGKey(3), 512)
    for n in (3, 4, 5, 7, 64):
        idx = jax.vmap(lambda k: vo._distinct3(k, jnp.int32(n)))(keys)
        idx = np.asarray(idx)
        assert idx.min() >= 0 and idx.max() < n
        assert (np.sort(idx, axis=1)[:, :-1] != np.sort(idx, axis=1)[:, 1:]).all()


def test_vo_minimal_match_count_distinct_sampling():
    """With exactly enough matches that any duplicate draw would be fatal,
    VO must still recover the motion (degenerate duplicate samples can't
    win once sampling is distinct)."""
    T_true = se3.exp(jnp.array([0.02, 0.0, -0.5, 0.0, 0.015, 0.0]))
    K, m = make_matches(jax.random.PRNGKey(4), T_true)
    valid = jnp.zeros(N, bool).at[:8].set(True)   # only 8 usable matches
    m = m._replace(valid=valid)
    res = vo.estimate_motion(m, K, jax.random.PRNGKey(5), CFG)
    assert bool(res.success)
    check_recovery(res.T_delta, T_true, tol_t=0.02, tol_r=2e-3)
