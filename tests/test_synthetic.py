import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import CameraConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic

H, W = 96, 320


def small_K():
    # scaled-down KITTI-like intrinsics for fast tests
    return Intrinsics.from_config(CameraConfig(
        fx=180.0, fy=180.0, cx=W / 2, cy=H / 2, baseline=0.54))


def test_render_shapes_and_ranges():
    K = small_K()
    world = synthetic.make_world(jax.random.PRNGKey(0))
    img, depth, sem, mov = synthetic.render(K, se3.identity(), world, H, W)
    assert img.shape == (H, W) and depth.shape == (H, W)
    assert sem.shape == (H, W) and mov.shape == (H, W)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    # lower half of image mostly hits ground -> positive depth
    assert float(jnp.mean((depth[H // 2 + 10:] > 0))) > 0.9


def test_stereo_disparity_consistency():
    """Right-camera rendering must be consistent with depth-derived disparity:
    sample left pixel intensity == right image at (u - disparity, v)."""
    K = small_K()
    world = synthetic.make_world(jax.random.PRNGKey(1))
    T = se3.identity()
    left, depth, _, _ = synthetic.render(K, T, world, H, W)
    right, _, _, _ = synthetic.render(
        K, synthetic.right_camera_pose(T, K.baseline), world, H, W)

    v, u = H // 2 + 20, W // 2  # a ground pixel
    z = float(depth[v, u])
    assert z > 0
    disp = float(K.bf) / z
    u_r = u - disp
    lo = int(np.floor(u_r))
    a = u_r - lo
    interp = (1 - a) * float(right[v, lo]) + a * float(right[v, lo + 1])
    # sub-pixel interpolated right intensity should match left closely
    assert abs(float(left[v, u]) - interp) < 0.03


def test_ground_depth_closed_form():
    """Ground-plane depth must satisfy z = fy * h / (v - cy)."""
    K = small_K()
    world = synthetic.make_world(jax.random.PRNGKey(2), n_boxes=0)
    _, depth, sem, _ = synthetic.render(K, se3.identity(), world, H, W)
    v = H - 5
    u = W // 2
    expected = float(K.fy) * float(world.ground_y) / (v - float(K.cy))
    assert sem[v, u] == synthetic.CLASS_ROAD
    assert abs(float(depth[v, u]) - expected) / expected < 1e-3


def test_moving_box_mask_and_motion():
    K = small_K()
    world = synthetic.make_world(jax.random.PRNGKey(3), with_moving_box=True)
    poses = synthetic.straight_trajectory(3, speed=0.5)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    assert seq["left"].shape == (3, H, W)
    # moving mask nonempty and its centroid shifts over frames
    m0, m2 = seq["moving"][0], seq["moving"][2]
    assert int(m0.sum()) > 50
    c0 = float(jnp.mean(jnp.where(m0, jnp.arange(W)[None, :], jnp.nan)
                        [jnp.isfinite(jnp.where(m0, jnp.arange(W)[None, :], jnp.nan))]))
    c2 = float(jnp.mean(jnp.where(m2, jnp.arange(W)[None, :], jnp.nan)
                        [jnp.isfinite(jnp.where(m2, jnp.arange(W)[None, :], jnp.nan))]))
    assert c2 > c0  # moves in +x (rightward in image)


def test_sequence_photoconsistency_under_motion():
    """A static world point seen in frame 0 and frame 1 has same intensity."""
    K = small_K()
    world = synthetic.make_world(jax.random.PRNGKey(4))
    poses = synthetic.straight_trajectory(2, speed=0.4)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    left0, depth0 = seq["left"][0], seq["depth"][0]
    left1 = seq["left"][1]
    v, u = H // 2 + 15, W // 2 + 30
    z = depth0[v, u]
    pt_c0 = jnp.array([(u - K.cx) * z / K.fx, (v - K.cy) * z / K.fy, z])
    # world = frame0 camera frame; reproject into frame 1
    pt_c1 = se3.transform_points(se3.inverse(seq["poses"][1]), pt_c0[None])[0]
    u1 = float(K.fx * pt_c1[0] / pt_c1[2] + K.cx)
    v1 = float(K.fy * pt_c1[1] / pt_c1[2] + K.cy)
    # bilinear sample of frame-1 intensity at the reprojected location
    L = np.asarray(left1)
    x0, y0 = int(np.floor(u1)), int(np.floor(v1))
    ax, ay = u1 - x0, v1 - y0
    i1 = ((1 - ay) * ((1 - ax) * L[y0, x0] + ax * L[y0, x0 + 1])
          + ay * ((1 - ax) * L[y0 + 1, x0] + ax * L[y0 + 1, x0 + 1]))
    # tolerance reflects bilinear-resampling error of the finest surviving
    # texture octave (a few px wavelength) plus the slight view dependence
    # of the mip LOD fade — not geometric inconsistency
    assert abs(float(left0[v, u]) - i1) < 0.08
