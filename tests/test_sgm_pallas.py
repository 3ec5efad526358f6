import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.ops import sgbm
from semantic_slam_mapping_tpu.ops.pallas import sgm_pallas


def test_pallas_sgm_matches_scan_reference():
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.uniform(0, 100, (37, 24, 16)).astype(np.float32))
    p1, p2 = 7.0, 50.0
    ref = sgbm._sgm_scan_bidir(cost, p1, p2)
    out = sgm_pallas.sgm_bidir_pallas(cost, p1, p2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_pallas_sgm_smooths_noise():
    # aggregation must prefer smooth disparity surfaces
    rng = np.random.default_rng(1)
    S, X, D = 20, 8, 12
    cost = jnp.asarray(rng.uniform(50, 60, (S, X, D)).astype(np.float32))
    # plant a consistent low-cost disparity band at d=5
    cost = cost.at[:, :, 5].add(-30.0)
    out = sgm_pallas.sgm_bidir_pallas(cost, 7.0, 100.0, interpret=True)
    wta = np.asarray(jnp.argmin(out, axis=-1))
    assert (wta == 5).mean() > 0.95
