import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import (CameraConfig, SgbmConfig,
                                              SlamConfig, VoConfig)
from semantic_slam_mapping_tpu.frontend import tracker
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.utils import metrics

H, W = 160, 480
CAM = CameraConfig(fx=300.0, fy=300.0, cx=W / 2, cy=H / 2, baseline=0.54)
CFG = SlamConfig(
    camera=CAM,
    sgbm=SgbmConfig(num_disparities=48, sad_window_size=7,
                    p1=8 * 49, p2=32 * 49, speckle_window_size=50),
    vo=VoConfig(ransac_iters=40, gn_iters_hypothesis=8, gn_iters_refine=25),
)
N_FRAMES = 6


@pytest.fixture(scope="module")
def sequence():
    K = Intrinsics.from_config(CAM)
    world = synthetic.make_world(jax.random.PRNGKey(20), n_boxes=14)
    poses = synthetic.straight_trajectory(N_FRAMES, speed=0.5,
                                          yaw_rate=0.004)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    return K, seq


def test_tracked_trajectory_matches_gt(sequence):
    K, seq = sequence
    state = tracker.TrackerState.initial()
    est = [np.eye(4)]
    key = jax.random.PRNGKey(0)
    for i in range(1, N_FRAMES):
        key, k = jax.random.split(key)
        state, out = tracker.track_frame(
            state, seq["left"][i], seq["right"][i],
            seq["left"][i - 1], seq["right"][i - 1], K, k, CFG)
        assert int(out.status) == tracker.OK
        assert bool(out.vo_success)
        est.append(np.asarray(out.pose))
    est = np.stack(est)
    gt = np.asarray(seq["poses"])
    ate = metrics.absolute_trajectory_error(est, gt)
    # at this scaled-down resolution (fx=300, ~10px disparities) per-frame
    # VO error is disparity-quantization-bound at ~2-4%; KITTI-scale runs
    # (bench.py) hold the tight bound instead
    assert ate.rmse < 0.3, ate
    rpe_t, rpe_r = metrics.relative_pose_error(est, gt)
    assert rpe_t.rmse < 0.05
    assert rpe_r.rmse < 0.005


def test_lost_on_garbage_frames(sequence):
    """Feeding unrelated noise frames: VO fails, tracker counts lost frames
    and predicts with constant velocity; status flips to LOST past the
    limit."""
    K, seq = sequence
    cfg = CFG.replace(tracker=CFG.tracker.__class__(max_lost_frames=2))
    state = tracker.TrackerState.initial()
    key = jax.random.PRNGKey(1)
    # initialize with one good step
    state, out = tracker.track_frame(
        state, seq["left"][1], seq["right"][1],
        seq["left"][0], seq["right"][0], K, key, cfg)
    noise = jax.random.uniform(jax.random.PRNGKey(9), (H, W))
    for i in range(4):
        key, k = jax.random.split(key)
        state, out = tracker.track_frame(
            state, noise, noise, seq["left"][0], seq["right"][0], K, k, cfg)
    assert int(state.status) == tracker.LOST
    # recovery resets status
    state = tracker.lost_recover(state, jnp.asarray(np.eye(4, dtype=np.float32)))
    assert int(state.status) == tracker.OK


def test_adjust_rewrites_pose(sequence):
    K, seq = sequence
    state = tracker.TrackerState.initial()
    new_pose = se3.exp(jnp.array([1.0, 2.0, 3.0, 0.1, 0.0, 0.0]))
    state = tracker.adjust(state, new_pose)
    np.testing.assert_allclose(np.asarray(state.pose),
                               np.asarray(new_pose), atol=1e-5)
