import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.backend import pnp
from semantic_slam_mapping_tpu.config import CameraConfig, PnpConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics, project

N = 200


def setup(key, T_true, n_outliers=0, noise=0.0):
    K = Intrinsics.from_config(CameraConfig())
    k1, k2, k3 = jax.random.split(key, 3)
    X = jnp.stack([
        jax.random.uniform(k1, (N,), minval=-12.0, maxval=12.0),
        jax.random.uniform(k2, (N,), minval=-3.0, maxval=3.0),
        jax.random.uniform(k3, (N,), minval=4.0, maxval=40.0)], axis=-1)
    uv = project(K, se3.transform_points(T_true, X))
    if noise:
        uv = uv + noise * jax.random.normal(k1, uv.shape)
    if n_outliers:
        uv = uv.at[:n_outliers].add(
            25.0 * jax.random.normal(k2, (n_outliers, 2)))
    return K, X, uv


def err(T_est, T_true):
    d = se3.compose(se3.inverse(T_est), T_true)
    return float(se3.translation_norm(d)), float(se3.rotation_angle(d))


def test_pnp_exact():
    T_true = se3.exp(jnp.array([0.2, -0.1, 0.5, 0.02, -0.03, 0.01]))
    K, X, uv = setup(jax.random.PRNGKey(0), T_true)
    res = pnp.solve_pnp(X, uv, jnp.ones(N, bool), K, se3.identity())
    assert bool(res.success)
    dt, dr = err(res.T, T_true)
    assert dt < 1e-3 and dr < 1e-4


def test_pnp_with_outliers_chi2_gating():
    T_true = se3.exp(jnp.array([0.1, 0.05, 0.8, 0.0, 0.02, 0.0]))
    K, X, uv = setup(jax.random.PRNGKey(1), T_true, n_outliers=60)
    res = pnp.solve_pnp(X, uv, jnp.ones(N, bool), K, se3.identity())
    assert bool(res.success)
    assert int(res.inliers[:60].sum()) < 6
    dt, dr = err(res.T, T_true)
    assert dt < 0.02 and dr < 2e-3


def test_pnp_respects_valid_mask():
    T_true = se3.exp(jnp.array([0.0, 0.0, 0.4, 0.0, 0.0, 0.0]))
    K, X, uv = setup(jax.random.PRNGKey(2), T_true)
    uv = uv.at[: N // 2].add(300.0)
    valid = jnp.arange(N) >= N // 2
    res = pnp.solve_pnp(X, uv, valid, K, se3.identity())
    assert bool(res.success)
    dt, dr = err(res.T, T_true)
    assert dt < 1e-3


def test_pnp_fails_below_min_inliers():
    T_true = se3.identity()
    K, X, uv = setup(jax.random.PRNGKey(3), T_true)
    valid = jnp.arange(N) < 5  # below pnp_min_inliers=10
    res = pnp.solve_pnp(X, uv, valid, K, se3.identity())
    assert not bool(res.success)


def test_pnp_init_far_from_solution():
    """4x10 LM schedule must pull in from a poor initial guess."""
    T_true = se3.exp(jnp.array([0.5, 0.2, 1.5, 0.05, 0.1, -0.04]))
    K, X, uv = setup(jax.random.PRNGKey(4), T_true, noise=0.2)
    res = pnp.solve_pnp(X, uv, jnp.ones(N, bool), K, se3.identity())
    assert bool(res.success)
    dt, dr = err(res.T, T_true)
    assert dt < 0.05 and dr < 5e-3
