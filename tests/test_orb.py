import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import CameraConfig, OrbConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.ops import image as im
from semantic_slam_mapping_tpu.ops import matching, orb

H, W = 120, 320


def world_image(key=0, pose=None):
    K = Intrinsics.from_config(CameraConfig(
        fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, baseline=0.54))
    world = synthetic.make_world(jax.random.PRNGKey(key))
    T = pose if pose is not None else se3.identity()
    img, _, _, _ = synthetic.render(K, T, world, H, W)
    return img


SMALL = OrbConfig(n_features=256, n_levels=4)


def test_extract_shapes_and_budget():
    img = world_image()
    f = orb.extract(img, SMALL)
    assert f.xy.shape == (256, 2)
    assert f.desc.shape == (256, orb.DESC_BITS)
    assert f.desc.dtype == jnp.uint8
    assert int(f.valid.sum()) > 50
    # levels populated beyond level 0
    assert int(jnp.max(jnp.where(f.valid, f.level, 0))) >= 1


def test_descriptor_rotation_invariance():
    """Same world point under in-plane rotation -> small Hamming distance."""
    rng = np.random.default_rng(0)
    base = im.gaussian_blur(
        jnp.asarray(rng.uniform(size=(96, 96)).astype(np.float32)), 2.0)
    pt = jnp.array([[48.0, 48.0]])
    ang0 = orb.orientation(base, pt)
    d0 = orb.descriptors(base, pt, ang0)

    # rotate image by 30 deg about the center
    th = np.deg2rad(30.0)
    c, s = np.cos(th), np.sin(th)
    g = jnp.stack(jnp.meshgrid(jnp.arange(96, dtype=jnp.float32),
                               jnp.arange(96, dtype=jnp.float32)), -1) - 48.0
    src = jnp.einsum("ij,hwj->hwi", jnp.array([[c, -s], [s, c]],
                                              jnp.float32), g) + 48.0
    rot = im.bilinear_sample(base, src.reshape(-1, 2)).reshape(96, 96)
    ang1 = orb.orientation(rot, pt)
    d1 = orb.descriptors(rot, pt, ang1)
    ham = int(jnp.sum(d0[0] != d1[0]))
    # rotation-compensated: far below the ~128 expectation of random pairs
    assert ham < 55


def test_matching_same_image_identity():
    img = world_image()
    f = orb.extract(img, SMALL)
    m = matching.match_descriptors(f.desc, f.desc, f.valid, f.valid,
                                   cross_check=False)
    idx = np.asarray(m.idx)
    valid = np.asarray(m.valid & f.valid)
    # every valid feature matches itself at distance 0
    assert (idx[valid] == np.nonzero(valid)[0]).mean() > 0.9


def test_matching_across_viewpoint():
    """Features must match across a small camera motion with mostly-correct
    geometry (reprojection-consistent displacement)."""
    pose1 = se3.exp(jnp.array([0.05, 0.0, 0.3, 0.0, 0.01, 0.0]))
    img0 = world_image(3)
    img1 = world_image(3, pose1)
    f0 = orb.extract(img0, SMALL)
    f1 = orb.extract(img1, SMALL)
    m = matching.match_descriptors(f0.desc, f1.desc, f0.valid, f1.valid)
    n_match = int(m.valid.sum())
    assert n_match > 30
    # matched displacement should be small (forward motion, mild flow)
    d = np.asarray(f1.xy[np.clip(np.asarray(m.idx), 0, None)] - f0.xy)
    d = d[np.asarray(m.valid)]
    assert np.median(np.abs(d)) < 25.0


def test_hamming_matrix_exact():
    a = jnp.array([[0, 1, 1, 0], [1, 1, 1, 1]], jnp.uint8)
    b = jnp.array([[0, 1, 1, 0], [0, 0, 0, 0], [1, 0, 1, 0]], jnp.uint8)
    d = matching.hamming_matrix(a, b)
    expect = np.array([[0, 2, 2], [2, 4, 2]], np.float32)
    np.testing.assert_allclose(np.asarray(d), expect)


def test_windowed_match_respects_window():
    a = jnp.zeros((2, 8), jnp.uint8).at[0, 0].set(1)
    b = jnp.zeros((2, 8), jnp.uint8).at[1, 0].set(1)
    xa = jnp.array([[0.0, 0.0], [100.0, 0.0]])
    xb = jnp.array([[200.0, 0.0], [1.0, 0.0]])  # b[1] near a[0]
    v = jnp.ones(2, bool)
    m = matching.windowed_match(a, xa, b, xb, v, v, du=10.0, dv=5.0)
    assert int(m.idx[0]) == 1 and bool(m.valid[0])
    assert not bool(m.valid[1])  # nothing within window of a[1]
