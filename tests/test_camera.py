import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import CameraConfig
from semantic_slam_mapping_tpu.geometry import camera


def K():
    return camera.Intrinsics.from_config(CameraConfig())


def test_project_backproject_roundtrip():
    k = K()
    pts = jnp.array([[1.0, 2.0, 10.0], [-3.0, 0.5, 25.0]])
    uv = camera.project(k, pts)
    rec = camera.backproject(k, uv, pts[:, 2])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), rtol=1e-5)


def test_stereo_projection_disparity():
    k = K()
    pts = jnp.array([[0.0, 0.0, 10.0]])
    obs = camera.project_stereo(k, pts)
    disparity = obs[0, 0] - obs[0, 2]
    expected = float(k.bf / 10.0)
    assert abs(float(disparity) - expected) < 1e-4
    assert float(obs[0, 1]) == float(obs[0, 3])  # rectified: same v


def test_triangulate_inverts_stereo_projection():
    k = K()
    pts = jnp.array([[1.5, -0.7, 8.0], [-4.0, 1.2, 30.0]])
    obs = camera.project_stereo(k, pts)
    disp = obs[:, 0] - obs[:, 2]
    rec = camera.triangulate_stereo(k, obs[:, :2], disp)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), rtol=1e-4)


def test_disparity_to_depth_gating():
    k = K()
    d = jnp.array([0.0, 0.2, 10.0])
    z = camera.disparity_to_depth(k, d)
    assert float(z[0]) == 0.0 and float(z[1]) == 0.0
    assert abs(float(z[2]) - float(k.bf) / 10.0) < 1e-4


def test_backproject_image_shape():
    k = K()
    depth = jnp.ones((8, 16)) * 5.0
    pts = camera.backproject_image(k, depth)
    assert pts.shape == (8, 16, 3)
    assert float(jnp.max(jnp.abs(pts[..., 2] - 5.0))) < 1e-6
