import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import (CameraConfig, KltConfig,
                                              QuadMatchConfig, VoConfig)
from semantic_slam_mapping_tpu.frontend import quadmatch, vo
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic

H, W = 160, 480


@pytest.fixture(scope="module")
def stereo_seq():
    K = Intrinsics.from_config(CameraConfig(
        fx=300.0, fy=300.0, cx=W / 2, cy=H / 2, baseline=0.54))
    world = synthetic.make_world(jax.random.PRNGKey(10), n_boxes=14)
    T_delta = se3.exp(jnp.array([0.02, 0.0, 0.6, 0.0, 0.008, 0.0]))
    poses = jnp.stack([se3.identity(), T_delta])
    seq = synthetic.render_sequence(K, world, poses, H, W)
    return K, seq, T_delta


def test_quad_match_finds_consistent_circles(stereo_seq):
    K, seq, _ = stereo_seq
    m = quadmatch.quad_match(
        cur_left=seq["left"][1], cur_right=seq["right"][1],
        prev_left=seq["left"][0], prev_right=seq["right"][0])
    n = int(m.valid.sum())
    assert n > 40
    # stereo epipolar structure: within the reference gate (minHeightDif=20,
    # quadmatcher.cpp:435), overwhelmingly sub-pixel on rectified input
    v = np.asarray(m.valid)
    dy = np.abs(np.asarray(m.lc[:, 1] - m.rc[:, 1]))[v]
    assert np.all(dy < 20.0)
    assert np.median(dy) < 0.5
    assert np.all(np.asarray(m.lc[:, 0] - m.rc[:, 0])[v] > 3.0)


def test_quad_match_disparity_matches_gt(stereo_seq):
    K, seq, _ = stereo_seq
    m = quadmatch.quad_match(
        cur_left=seq["left"][1], cur_right=seq["right"][1],
        prev_left=seq["left"][0], prev_right=seq["right"][0])
    v = np.asarray(m.valid)
    lc = np.asarray(m.lc)[v]
    disp = (np.asarray(m.lc[:, 0] - m.rc[:, 0]))[v]
    depth = np.asarray(seq["depth"][1])
    gt_d = float(K.bf) / np.maximum(
        depth[np.clip(lc[:, 1].round().astype(int), 0, H - 1),
              np.clip(lc[:, 0].round().astype(int), 0, W - 1)], 0.5)
    err = np.abs(disp - gt_d)
    assert np.median(err) < 0.5


def test_quad_match_into_vo_recovers_motion(stereo_seq):
    """End-to-end frontend slice: quad match -> RANSAC VO == GT motion."""
    K, seq, T_delta = stereo_seq
    m = quadmatch.quad_match(
        cur_left=seq["left"][1], cur_right=seq["right"][1],
        prev_left=seq["left"][0], prev_right=seq["right"][0])
    res = vo.estimate_motion(
        m, K, jax.random.PRNGKey(0),
        VoConfig(ransac_iters=50, gn_iters_hypothesis=10, gn_iters_refine=30))
    assert bool(res.success)
    # estimated motion is cam_prev -> cam_cur; GT poses are cam-to-world:
    # T_delta_gt = inv(T_w_c1) @ T_w_c0 maps prev-cam coords... careful:
    # point fixed in world: X_c1 = inv(T1) X_w = inv(T1) T0 X_c0
    T_gt = se3.compose(se3.inverse(seq["poses"][1]), seq["poses"][0])
    dt = float(se3.translation_norm(se3.compose(se3.inverse(res.T_delta), T_gt)))
    dr = float(se3.rotation_angle(se3.compose(se3.inverse(res.T_delta), T_gt)))
    assert dt < 0.03, dt
    assert dr < 0.005, dr


def test_closure_gate_active(stereo_seq):
    """The circular-consistency gate must actually reject chains that do not
    close on the direct lc->lp track: disabling it (huge threshold) must
    admit strictly more matches on hard (flipped-prev) input."""
    K, seq, _ = stereo_seq
    args = dict(cur_left=seq["left"][1], cur_right=seq["right"][1],
                prev_left=seq["left"][0][::-1],
                prev_right=seq["right"][0][::-1])
    tight = quadmatch.quad_match(
        qcfg=QuadMatchConfig(loop_consistency_px=1.0), **args)
    loose = quadmatch.quad_match(
        qcfg=QuadMatchConfig(loop_consistency_px=1e9), **args)
    assert int(tight.valid.sum()) < int(loose.valid.sum())


def test_epipolar_gate_active(stereo_seq):
    """Vertically shifting the right image violates the rectified-epipolar
    assumption; the |dy| gate must collapse the match count."""
    K, seq, _ = stereo_seq
    # 25 px > the reference's minHeightDif=20 gate (quadmatcher.cpp:435);
    # small shifts are tolerated exactly as the reference tolerates them
    shifted = jnp.roll(seq["right"][1], 25, axis=0)
    m = quadmatch.quad_match(
        cur_left=seq["left"][1], cur_right=shifted,
        prev_left=seq["left"][0], prev_right=seq["right"][0])
    good = quadmatch.quad_match(
        cur_left=seq["left"][1], cur_right=seq["right"][1],
        prev_left=seq["left"][0], prev_right=seq["right"][0])
    assert int(m.valid.sum()) < int(good.valid.sum()) * 0.3


def test_flow_prior_recovers_large_motion():
    """Weak item r1 #8: the constant-velocity flow prior (track.cpp:41
    seeding) must be live — on a large inter-frame motion the seeded
    temporal KLT legs recover matches the unseeded tracker loses."""
    from semantic_slam_mapping_tpu.config import GfttConfig

    K = Intrinsics.from_config(CameraConfig(
        fx=300.0, fy=300.0, cx=W / 2, cy=H / 2, baseline=0.54))
    world = synthetic.make_world(jax.random.PRNGKey(21), n_boxes=10)
    # strong yaw: large, roughly uniform horizontal flow
    T0 = se3.identity()
    T1 = se3.compose(T0, se3.exp(jnp.array([0.0, 0.0, 0.4, 0.0, 0.12, 0.0])))
    prev_l, _, _, _ = synthetic.render(K, T0, world, H, W)
    prev_r, _, _, _ = synthetic.render(
        K, synthetic.right_camera_pose(T0, K.baseline), world, H, W)
    cur_l, _, _, _ = synthetic.render(K, T1, world, H, W)
    cur_r, _, _, _ = synthetic.render(
        K, synthetic.right_camera_pose(T1, K.baseline), world, H, W)

    # true mean flow cur->prev of a mid-depth central point
    from semantic_slam_mapping_tpu.geometry.camera import project
    Xc = jnp.array([[0.0, 0.0, 20.0]])
    Xp = se3.transform_points(
        se3.compose(se3.inverse(T0), T1), Xc)  # cur-cam point in prev-cam
    prior = project(K, Xp)[0] - jnp.array([K.cx, K.cy])
    assert float(jnp.abs(prior[0])) > 25.0  # genuinely large flow

    kw = dict(cur_left=cur_l, cur_right=cur_r,
              prev_left=prev_l, prev_right=prev_r,
              qcfg=QuadMatchConfig(max_features=256),
              gcfg=GfttConfig(), kcfg=KltConfig())
    m_without = quadmatch.quad_match(**kw)
    m_with = quadmatch.quad_match(**kw, flow_prior=prior)
    n_without = int(m_without.valid.sum())
    n_with = int(m_with.valid.sum())
    assert n_with > max(n_without, 10), (n_with, n_without)
