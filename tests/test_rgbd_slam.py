"""RGB-D mode of the FULL SlamSystem (VERDICT r4 item 7): the TUM-style
ORB+PnP frontend (track.cpp:140-200) feeding keyframes, BoW loops, the pose
graph and the semantic map — not just the frontend-only tracker."""

import jax
import numpy as np
import pytest

from semantic_slam_mapping_tpu.backend import looper as lp
from semantic_slam_mapping_tpu.config import (CameraConfig, LooperConfig,
                                              OrbConfig, PnpConfig,
                                              PoseGraphConfig, SlamConfig)
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.pipeline import SlamSystem
from semantic_slam_mapping_tpu.utils import metrics

H, W = 128, 192
N_FRAMES = 16
CAM = CameraConfig(fx=150.0, fy=150.0, cx=W / 2, cy=H / 2, baseline=0.1)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=384, n_levels=4),
    pnp=PnpConfig(min_inliers=10, min_matches=12),
    pose_graph=PoseGraphConfig(keyframe_min_translation=0.25,
                               keyframe_min_rotation=0.2,
                               pcg_iters=40, max_keyframes=64),
    looper=LooperConfig(min_sim_score=0.02, min_interval=4),
)


@pytest.fixture(scope="module")
def rgbd_seq():
    K = Intrinsics.from_config(CAM)
    world = synthetic.make_world(jax.random.PRNGKey(11), n_boxes=20)
    poses = synthetic.straight_trajectory(N_FRAMES, speed=0.12,
                                          yaw_rate=0.004)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    return seq


def test_rgbd_full_system(rgbd_seq):
    seq = rgbd_seq
    from semantic_slam_mapping_tpu.ops import orb as orb_mod
    f = orb_mod.extract(seq["left"][0], CFG.orb)
    vocab = lp.build_vocabulary(np.asarray(f.desc)[np.asarray(f.valid)],
                                branching=6, depth=3)
    sys_ = SlamSystem(CFG, vocab=vocab, enable_mapping=True, rgbd=True)
    gray = np.asarray(seq["left"])
    depth = np.asarray(seq["depth"])
    color = (np.clip(gray, 0, 1) * 255).astype(np.uint8)
    color = np.stack([color] * 3, -1)
    sem = np.asarray(seq["semantic"])
    sys_.process_stream_rgbd(
        (gray[i], depth[i], color[i], sem[i]) for i in range(N_FRAMES))
    traj = sys_.finish()
    assert traj.shape == (N_FRAMES, 4, 4)
    # the full backend ran: keyframes + odometry/nearby edges + a map
    assert len(sys_.keyframes) >= 3
    assert sys_.n_edges >= len(sys_.keyframes) - 1
    assert len(sys_.map) > 100
    gt = np.asarray(seq["poses"])
    ate = metrics.absolute_trajectory_error(traj, gt)
    assert ate.rmse < 0.15, ate
    # keyframes carry depth in the disparity slot and no right image
    kf = sys_.keyframes[0]
    assert kf.right is None
    assert kf.disparity is not None


def test_rgbd_serial_matches_stream(rgbd_seq):
    """Pipelined == serial for the RGB-D driver. Mid-stream optimizations
    are disabled here: the pipelined adjust PnP-refines the newest
    in-flight frame (no serial equivalent — documented mode difference,
    covered with tolerance by the stereo equivalence test), which can flip
    a borderline keyframe gate; without them the two drivers must agree
    EXACTLY (this is what pins the deferred-epoch machinery itself)."""
    import dataclasses
    seq = rgbd_seq
    gray = np.asarray(seq["left"])
    depth = np.asarray(seq["depth"])
    cfg = dataclasses.replace(CFG, pose_graph=dataclasses.replace(
        CFG.pose_graph, local_accumulate_error=1e9,
        loop_accumulate_error=1e9))
    a = SlamSystem(cfg, rgbd=True)
    for i in range(N_FRAMES):
        a.process_frame_rgbd(gray[i], depth[i])
    b = SlamSystem(cfg, rgbd=True)
    b.process_stream_rgbd((gray[i], depth[i]) for i in range(N_FRAMES))
    ta, tb = a.finish(), b.finish()
    assert len(a.keyframes) == len(b.keyframes)
    assert a.n_edges == b.n_edges
    np.testing.assert_allclose(ta, tb, atol=1e-5)
