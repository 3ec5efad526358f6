import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.ops import image as im


def test_gaussian_blur_preserves_mean_and_smooths():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(32, 48)).astype(np.float32))
    y = im.gaussian_blur(x, sigma=1.5)
    assert abs(float(x.mean()) - float(y.mean())) < 1e-3
    assert float(jnp.var(y)) < float(jnp.var(x))


def test_gradients_of_ramp():
    xs = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32)[None, :], (16, 32))
    ix, iy = im.gradients(xs)
    # interior gradient of a unit ramp in x is 1, y is 0
    np.testing.assert_allclose(np.asarray(ix[4:-4, 4:-4]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iy[4:-4, 4:-4]), 0.0, atol=1e-4)


def test_downsample2_shape():
    x = jnp.ones((64, 96))
    y = im.downsample2(x)
    assert y.shape == (32, 48)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-5)


def test_pyramid_levels():
    x = jnp.zeros((128, 256))
    pyr = im.build_pyramid(x, 3, 2.0)
    assert [p.shape for p in pyr] == [(128, 256), (64, 128), (32, 64)]
    pyr12 = im.build_pyramid(x, 4, 1.2)
    assert pyr12[1].shape == (107, 213)


def test_bilinear_sample_exact_and_interp():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    # integer coords -> exact values
    v = im.bilinear_sample(img, jnp.array([[1.0, 2.0]]))  # x=1, y=2
    assert float(v[0]) == 9.0
    # halfway between (0,0)=0 and (1,0)=1
    v = im.bilinear_sample(img, jnp.array([[0.5, 0.0]]))
    assert abs(float(v[0]) - 0.5) < 1e-6
    # out of bounds -> pad
    v = im.bilinear_sample(img, jnp.array([[-1.0, 0.0]]), pad_value=-7.0)
    assert float(v[0]) == -7.0


def test_morphology_dilate_erode():
    x = jnp.zeros((9, 9)).at[4, 4].set(1.0)
    d = im.dilate(x, 3)
    assert float(d.sum()) == 9.0
    e = im.erode(d, 3)
    assert float(e.sum()) == 1.0 and float(e[4, 4]) == 1.0


def test_otsu_bimodal():
    rng = np.random.default_rng(1)
    a = rng.normal(0.2, 0.03, 500)
    b = rng.normal(0.8, 0.03, 500)
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    th = float(im.otsu_threshold(x))
    assert 0.35 < th < 0.65
