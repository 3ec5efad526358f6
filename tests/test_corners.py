import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.ops import corners


def checkerboard(h=64, w=64, sq=8):
    y, x = np.mgrid[0:h, 0:w]
    return jnp.asarray((((y // sq) + (x // sq)) % 2).astype(np.float32))


def test_shi_tomasi_fires_on_checker_corners():
    img = checkerboard()
    kp = corners.gftt(img, max_corners=64, quality_level=0.1)
    assert int(kp.valid.sum()) >= 9
    xy = np.asarray(kp.xy[kp.valid])
    # all detections near multiples of 8 (the checker corner lattice)
    d = np.abs(((xy + 4.0) % 8.0) - 4.0)
    assert d.max() < 2.0


def test_fast_detects_bright_blob_corners():
    img = jnp.zeros((48, 48)).at[20:28, 20:28].set(1.0)
    resp = corners.fast_response(img, threshold=0.3)
    assert float(resp.max()) > 0
    ys, xs = np.nonzero(np.asarray(resp))
    # responses only near the square boundary corners
    assert all((15 <= y <= 32 and 15 <= x <= 32) for y, x in zip(ys, xs))


def test_fast_ignores_flat_and_edges():
    flat = jnp.full((32, 32), 0.5)
    assert float(corners.fast_response(flat, 0.1).max()) == 0.0
    # a straight vertical edge: arc length along circle <= 8, no corner
    edge = jnp.zeros((32, 32)).at[:, 16:].set(1.0)
    resp = corners.fast_response(edge, 0.3)
    assert float(resp.max()) == 0.0


def test_select_keypoints_budget_and_mask():
    rng = np.random.default_rng(0)
    resp = jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32))
    kp = corners.select_keypoints(resp, max_corners=32, quality_level=0.0,
                                  cell_size=8, border=4)
    assert kp.xy.shape == (32, 2)
    assert kp.valid.dtype == jnp.bool_
    xy = np.asarray(kp.xy[kp.valid])
    assert (xy >= 4).all() and (xy < 60).all()


def test_grid_cells_spread_detections():
    # one dominant corner per cell: selection should not clump
    img = checkerboard(64, 64, 8)
    kp = corners.gftt(img, max_corners=40, quality_level=0.05, min_distance=8)
    xy = np.asarray(kp.xy[kp.valid]).astype(int)
    cells = set(map(tuple, xy // 8))
    assert len(cells) >= len(xy) * 0.8  # mostly distinct cells
