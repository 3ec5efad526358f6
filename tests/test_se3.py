import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.geometry import se3


def random_xi(key, scale=1.0):
    return jax.random.normal(key, (6,)) * scale


def test_exp_log_roundtrip():
    # |w| < pi so the tangent roundtrips exactly
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    xi = jnp.stack([random_xi(k, scale=0.8) for k in keys])
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_log_exp_matrix_roundtrip_large_rotation():
    # |w| may exceed pi: tangents differ but matrices must roundtrip
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    xi = jnp.stack([random_xi(k, scale=1.5) for k in keys])
    T = se3.exp(xi)
    T2 = se3.exp(se3.log(T))
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=2e-3)


def test_exp_small_angle():
    xi = jnp.array([1e-6, -2e-6, 3e-6, 1e-7, -1e-7, 2e-7])
    T = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(xi[:3]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-6)


def test_inverse():
    T = se3.exp(jnp.array([0.5, -0.2, 1.0, 0.3, 0.1, -0.4]))
    I = T @ se3.inverse(T)
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_rotation_is_orthonormal():
    T = se3.exp(jnp.array([0.0, 0.0, 0.0, 2.0, -1.5, 0.7]))
    R = np.asarray(T[:3, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5


def test_transform_points_matches_matmul():
    T = se3.exp(jnp.array([1.0, 2.0, 3.0, 0.2, 0.3, -0.1]))
    pts = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    out = se3.transform_points(T, pts)
    hom = jnp.concatenate([pts, jnp.ones((10, 1))], axis=-1)
    ref = (hom @ T.T)[:, :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_norm_helpers():
    # reference utils.h:16-24: translation norm + rotation angle of rel pose
    xi = jnp.array([3.0, 4.0, 0.0, 0.0, 0.0, 0.5])
    T = se3.exp(xi)
    assert float(se3.rotation_angle(T)) == pytest.approx(0.5, abs=1e-5)
    t = np.asarray(T[:3, 3])
    assert float(se3.translation_norm(T)) == pytest.approx(
        np.linalg.norm(t), abs=1e-5)


def test_orthonormalize_recovers_drift():
    T = se3.exp(jnp.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6]))
    drifted = T.at[:3, :3].multiply(1.0 + 1e-3)
    fixed = se3.orthonormalize(drifted)
    R = np.asarray(fixed[:3, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_log_near_pi():
    w = jnp.array([0.0, 0.0, 3.1415])
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)


def test_adjoint_property():
    # Ad_T xi == log(T exp(xi) T^-1) for small xi
    T = se3.exp(jnp.array([0.3, -0.1, 0.2, 0.2, 0.1, -0.3]))
    xi = jnp.array([1e-3, 2e-3, -1e-3, 5e-4, -2e-4, 1e-3])
    lhs = se3.adjoint(T) @ xi
    rhs = se3.log(T @ se3.exp(xi) @ se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_vmap_exp():
    xi = jax.random.normal(jax.random.PRNGKey(2), (32, 6))
    T = jax.vmap(se3.exp)(xi)
    assert T.shape == (32, 4, 4)
    T2 = se3.exp(xi)  # broadcast path
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=1e-6)


def test_se3_np_mirrors_jax():
    """Host-side numpy twins (geometry/se3_np.py) must match the jax
    versions — the pipeline's edge chi2 / export paths depend on it."""
    from semantic_slam_mapping_tpu.geometry import se3_np
    xi = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (64, 6)))
    T = np.asarray(se3.exp(jnp.asarray(xi)), np.float64)
    np.testing.assert_allclose(se3_np.inverse(T),
                               np.asarray(se3.inverse(jnp.asarray(T))),
                               atol=1e-5)
    np.testing.assert_allclose(se3_np.log(T),
                               np.asarray(se3.log(jnp.asarray(T))),
                               atol=1e-4)
    np.testing.assert_allclose(
        se3_np.rotation_to_quaternion(T[:, :3, :3]),
        np.asarray(se3.rotation_to_quaternion(jnp.asarray(T[:, :3, :3]))),
        atol=1e-5)
