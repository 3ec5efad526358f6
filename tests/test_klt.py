import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import KltConfig
from semantic_slam_mapping_tpu.ops import image as im
from semantic_slam_mapping_tpu.ops import klt


def textured(h=96, w=128, seed=0):
    """Multi-octave texture: like real images, has structure at several
    scales, so coarse pyramid levels have usable pull-in range."""
    rng = np.random.default_rng(seed)
    base = jnp.asarray(rng.uniform(size=(h, w)).astype(np.float32))
    coarse = im.gaussian_blur(base, 6.0)
    mid = im.gaussian_blur(base, 2.5)
    fine = im.gaussian_blur(base, 1.2)
    x = 3.0 * coarse + 1.0 * mid + 0.4 * fine
    return (x - x.min()) / (x.max() - x.min())


def shift_image(img, dx, dy):
    """Bilinear-shift an image by (dx, dy): out(x) = img(x - d)."""
    H, W = img.shape
    g = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                               jnp.arange(H, dtype=jnp.float32)), -1)
    coords = g - jnp.array([dx, dy])
    return im.bilinear_sample(img, coords.reshape(-1, 2)).reshape(H, W)


def test_klt_recovers_pure_translation():
    img = textured()
    dx, dy = 3.3, -2.1
    tgt = shift_image(img, dx, dy)
    pts = jnp.array([[40.0, 40.0], [64.0, 50.0], [90.0, 30.0], [30.0, 70.0]])
    res = klt.track(img, tgt, pts)
    assert bool(res.status.all())
    flow = np.asarray(res.xy - pts)
    np.testing.assert_allclose(flow, [[dx, dy]] * 4, atol=0.15)


def test_klt_large_motion_needs_pyramid():
    img = textured(seed=1)
    dx, dy = 11.0, 6.0
    tgt = shift_image(img, dx, dy)
    pts = jnp.array([[50.0, 40.0], [70.0, 60.0]])
    res = klt.track(img, tgt, pts, KltConfig(pyramid_levels=3))
    flow = np.asarray(res.xy - pts)
    np.testing.assert_allclose(flow, [[dx, dy]] * 2, atol=0.3)


def test_klt_flags_flat_regions():
    img = jnp.full((64, 64), 0.5)
    res = klt.track(img, img, jnp.array([[32.0, 32.0]]))
    assert not bool(res.status[0])


def test_klt_initial_guess_used():
    img = textured(seed=2)
    dx = 20.0
    tgt = shift_image(img, dx, 0.0)
    pts = jnp.array([[40.0, 48.0]])
    init = jnp.array([[18.0, 0.0]])  # prior close to true flow
    res = klt.track(img, tgt, pts, KltConfig(pyramid_levels=1), init=init)
    assert abs(float(res.xy[0, 0] - pts[0, 0]) - dx) < 0.5


def test_klt_status_out_of_bounds():
    img = textured(seed=3)
    tgt = shift_image(img, 30.0, 0.0)
    pts = jnp.array([[120.0, 48.0]])  # will exit the image
    res = klt.track(img, tgt, pts)
    assert not bool(res.status[0])
