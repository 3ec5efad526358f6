import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import (CameraConfig, OrbConfig,
                                              SlamConfig)
from semantic_slam_mapping_tpu.frontend import rgbd_tracker as rt
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.utils import metrics

H, W = 160, 320
CAM = CameraConfig(fx=250.0, fy=250.0, cx=W / 2, cy=H / 2, baseline=0.54)
CFG = SlamConfig(camera=CAM, orb=OrbConfig(n_features=512, n_levels=4))
N_FRAMES = 6


@pytest.fixture(scope="module")
def rgbd_seq():
    """TUM-style sequence: gray + metric depth per frame, GT poses."""
    K = Intrinsics.from_config(CAM)
    world = synthetic.make_world(jax.random.PRNGKey(60), n_boxes=12)
    poses = synthetic.straight_trajectory(N_FRAMES, speed=0.25,
                                          yaw_rate=0.01)
    grays, depths = [], []
    for i in range(N_FRAMES):
        g, d, _, _ = synthetic.render(K, poses[i], world, H, W)
        grays.append(g)
        depths.append(d)
    return K, jnp.stack(grays), jnp.stack(depths), poses


def test_rgbd_tracking_follows_gt(rgbd_seq):
    K, grays, depths, poses = rgbd_seq
    state = rt.RgbdTrackerState.initial(CFG.orb.n_features)
    est = []
    for i in range(N_FRAMES):
        state, out = rt.track_frame_rgbd(state, grays[i], depths[i], K, CFG)
        est.append(np.asarray(out.pose))
        if i >= 1:
            assert bool(out.success), f"frame {i}"
            assert int(out.n_inliers) >= 10
    est = np.stack(est)
    gt = np.asarray(poses)
    ate = metrics.absolute_trajectory_error(est, gt)
    assert ate.rmse < 0.08, ate


def test_rgbd_first_frame_initializes(rgbd_seq):
    K, grays, depths, poses = rgbd_seq
    state = rt.RgbdTrackerState.initial(CFG.orb.n_features)
    state, out = rt.track_frame_rgbd(state, grays[0], depths[0], K, CFG)
    assert int(state.status) == rt.OK
    np.testing.assert_allclose(np.asarray(out.pose), np.eye(4), atol=1e-6)
    assert int(state.ref_valid.sum()) > 50


def test_rgbd_lost_on_noise(rgbd_seq):
    K, grays, depths, poses = rgbd_seq
    cfg = CFG.replace(tracker=CFG.tracker.__class__(max_lost_frames=1))
    state = rt.RgbdTrackerState.initial(cfg.orb.n_features)
    state, _ = rt.track_frame_rgbd(state, grays[0], depths[0], K, cfg)
    for i in range(3):
        noise = jax.random.uniform(jax.random.PRNGKey(i), (H, W))
        state, out = rt.track_frame_rgbd(state, noise, depths[0], K, cfg)
    assert int(state.status) == rt.LOST


def test_rgbd_ref_deque_survives_dropout(rgbd_seq):
    """One corrupted frame must not break the chain: failed frames are not
    pushed into the ref deque (track.cpp:158-176), so the next good frame
    still matches the retained references (trackRefFrame semantics)."""
    K, grays, depths, poses = rgbd_seq
    state = rt.RgbdTrackerState.initial(CFG.orb.n_features, ref_frames=5)
    for i in range(3):
        state, out = rt.track_frame_rgbd(state, grays[i], depths[i], K, CFG)
        if i:
            assert bool(out.success)
    noise = jax.random.uniform(jax.random.PRNGKey(1), (H, W))
    state, out = rt.track_frame_rgbd(state, noise, depths[2], K, CFG)
    assert not bool(out.success)
    state, out = rt.track_frame_rgbd(state, grays[3], depths[3], K, CFG)
    assert bool(out.success)
    err = np.linalg.norm(np.asarray(out.pose)[:3, 3]
                         - np.asarray(poses)[3][:3, 3])
    assert err < 0.15, err
