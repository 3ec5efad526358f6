"""Multi-chip frontend: sharded window tracking must match the
single-device batched tracker (VERDICT r1 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import (CameraConfig, QuadMatchConfig,
                                              SgbmConfig, SlamConfig,
                                              VoConfig)
from semantic_slam_mapping_tpu.frontend import tracker
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.parallel import mesh as pmesh
from semantic_slam_mapping_tpu.parallel.sharded_frontend import \
    track_frames_sharded

H, W = 96, 256
CFG = SlamConfig(
    camera=CameraConfig(fx=250.0, fy=250.0, cx=W / 2, cy=H / 2,
                        baseline=0.54),
    sgbm=SgbmConfig(num_disparities=32, sad_window_size=5,
                    p1=8 * 25, p2=32 * 25, speckle_window_size=50),
    quadmatch=QuadMatchConfig(max_features=128),
    vo=VoConfig(ransac_iters=64))


@pytest.fixture(scope="module")
def window():
    K = Intrinsics.from_config(CFG.camera)
    world = synthetic.make_world(jax.random.PRNGKey(11), n_boxes=10)
    poses = synthetic.straight_trajectory(9, speed=0.5)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    return K, seq


def test_sharded_matches_single_device(window):
    K, seq = window
    mesh = pmesh.make_mesh(dp=8, tp=1)
    state0 = tracker.TrackerState.initial(CFG)
    key = jax.random.PRNGKey(3)

    s1, r1 = tracker.track_frames_batched(
        state0, seq["left"], seq["right"], K, key, CFG)
    s2, r2 = track_frames_sharded(
        state0, seq["left"], seq["right"], K, key, CFG, mesh)

    # identical RNG per pair -> identical VO; poses must agree tightly
    np.testing.assert_allclose(np.asarray(r2.pose), np.asarray(r1.pose),
                               atol=5e-3)
    np.testing.assert_array_equal(np.asarray(r2.vo_success),
                                  np.asarray(r1.vo_success))
    np.testing.assert_allclose(np.asarray(s2.pose), np.asarray(s1.pose),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(r2.disparity),
                               np.asarray(r1.disparity), atol=1e-2)
    np.testing.assert_allclose(np.asarray(r2.pitch), np.asarray(r1.pitch),
                               atol=1e-4)
    assert np.asarray(r2.moving_mask).shape == (8, H, W)


def test_sharded_output_shardings(window):
    K, seq = window
    mesh = pmesh.make_mesh(dp=8, tp=1)
    state0 = tracker.TrackerState.initial(CFG)
    _, r2 = track_frames_sharded(
        state0, seq["left"], seq["right"], K, jax.random.PRNGKey(3),
        CFG, mesh)
    # image-sized outputs stay sharded over the data axis (no full-window
    # gather of dense fields)
    disp_shards = r2.disparity.addressable_shards
    assert len(disp_shards) == 8
    assert all(s.data.shape[0] == 1 for s in disp_shards)


def test_slam_system_e2e_on_mesh(window):
    """Deployment of the sharded frontend (VERDICT r2 item 3): a
    SlamSystem constructed with a Mesh routes process_window through
    track_frames_sharded; trajectory and keyframe decisions must match the
    single-device batched system."""
    from semantic_slam_mapping_tpu.pipeline import SlamSystem
    import dataclasses
    K, seq = window
    cfg = dataclasses.replace(
        CFG, pose_graph=dataclasses.replace(
            CFG.pose_graph, max_keyframes=32, pcg_iters=20,
            keyframe_min_translation=1.0))
    mesh = pmesh.make_mesh(dp=8, tp=1)

    a = SlamSystem(cfg, mesh=mesh, seed=3)
    a.process_window(seq["left"], seq["right"])
    b = SlamSystem(cfg, seed=3)
    b.process_window(seq["left"], seq["right"])

    assert a.frame_count == b.frame_count == 9
    assert len(a.keyframes) == len(b.keyframes) >= 1
    np.testing.assert_allclose(np.stack(a.trajectory),
                               np.stack(b.trajectory), atol=5e-2)
