import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import OrbConfig, VoConfig
from semantic_slam_mapping_tpu.frontend import quadmatch_desc, vo
from semantic_slam_mapping_tpu.geometry import se3

from tests.test_quadmatch import H, W, stereo_seq  # fixture reuse

OCFG = OrbConfig(n_features=384, n_levels=4)


def test_desc_quad_match_geometry(stereo_seq):
    K, seq, T_delta = stereo_seq
    m = quadmatch_desc.quad_match_desc(
        cur_left=seq["left"][1], cur_right=seq["right"][1],
        prev_left=seq["left"][0], prev_right=seq["right"][0], ocfg=OCFG)
    n = int(m.valid.sum())
    assert n > 15, n
    v = np.asarray(m.valid)
    dy = np.abs(np.asarray(m.lc[:, 1] - m.rc[:, 1]))[v]
    # every match inside the reference epipolar gate (minHeightDif=20,
    # quadmatcher.cpp:435); the bulk at sub-pixel |dy| on rectified input
    assert np.all(dy < 20.0)
    assert np.median(dy) < 1.0
    assert np.all(np.asarray(m.lc[:, 0] - m.rc[:, 0])[v] > 3.0)


def test_desc_quad_match_into_vo(stereo_seq):
    K, seq, T_delta = stereo_seq
    m = quadmatch_desc.quad_match_desc(
        cur_left=seq["left"][1], cur_right=seq["right"][1],
        prev_left=seq["left"][0], prev_right=seq["right"][0], ocfg=OCFG)
    res = vo.estimate_motion(
        m, K, jax.random.PRNGKey(0),
        VoConfig(ransac_iters=50, gn_iters_hypothesis=10, gn_iters_refine=30))
    assert bool(res.success)
    T_gt = se3.compose(se3.inverse(seq["poses"][1]), seq["poses"][0])
    dt = float(se3.translation_norm(
        se3.compose(se3.inverse(res.T_delta), T_gt)))
    assert dt < 0.08, dt
