import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.config import CameraConfig, SgbmConfig
from semantic_slam_mapping_tpu.geometry import se3, stereo as gstereo
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.ops import sgbm

H, W = 96, 320
CFG = SgbmConfig(num_disparities=48, sad_window_size=7,
                 p1=8 * 49, p2=32 * 49, speckle_window_size=50)


@pytest.fixture(scope="module")
def scene():
    K = Intrinsics.from_config(CameraConfig(
        fx=160.0, fy=160.0, cx=W / 2, cy=H / 2, baseline=0.54))
    world = synthetic.make_world(jax.random.PRNGKey(5), n_boxes=8)
    T = se3.identity()
    left, depth, _, _ = synthetic.render(K, T, world, H, W)
    right, _, _, _ = synthetic.render(
        K, synthetic.right_camera_pose(T, K.baseline), world, H, W)
    gt_disp = np.where(np.asarray(depth) > 0.1,
                       float(K.bf) / np.maximum(np.asarray(depth), 0.1), 0.0)
    return K, left, right, gt_disp


def test_sgbm_matches_ground_truth(scene):
    K, left, right, gt = scene
    res = sgbm.compute(left, right, CFG)
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid)
    # evaluate only where GT is in measurable range and not at the border
    m = v & (gt > 1.0) & (gt < CFG.num_disparities - 2)
    m[:, :CFG.num_disparities] = False
    assert m.mean() > 0.3  # decent coverage
    err = np.abs(d[m] - gt[m])
    assert np.median(err) < 0.5          # subpixel on most pixels
    assert (err < 2.0).mean() > 0.9      # <10% outliers


def test_sgbm_invalidates_occlusions_left_border(scene):
    K, left, right, gt = scene
    res = sgbm.compute(left, right, CFG)
    v = np.asarray(res.valid)
    d = np.asarray(res.disparity)
    # invalid pixels are marked INVALID
    assert np.all(d[~v] == sgbm.INVALID)


def test_triangulate_image_roundtrip(scene):
    K, left, right, gt = scene
    cam = CameraConfig(fx=160.0, fy=160.0, cx=W / 2, cy=H / 2, baseline=0.54)
    pts = gstereo.triangulate_image(K, jnp.asarray(gt.astype(np.float32)), cam)
    z = np.asarray(pts.xyz[..., 2])
    valid = np.asarray(pts.valid)
    expect_z = np.where(gt > 0.5, float(K.bf) / np.maximum(gt, 0.5), 0.0)
    np.testing.assert_allclose(z[valid], expect_z[valid], rtol=1e-4)
    # roi excludes far points
    far = z > cam.roiz
    assert not np.any(np.asarray(pts.roi)[far & valid])


def test_correct_pitch_levels_ground():
    """A pitched camera sees a tilted ground; correcting by the pitch angle
    must make ground Y approximately constant."""
    cam = CameraConfig(fx=160.0, fy=160.0, cx=W / 2, cy=H / 2, baseline=0.54,
                       roiy=50.0, roiz=100.0)
    K = Intrinsics.from_config(cam)
    pitch = 0.06
    world = synthetic.make_world(jax.random.PRNGKey(6), n_boxes=0)
    T = se3.exp(jnp.array([0.0, 0.0, 0.0, pitch, 0.0, 0.0]))
    _, depth, _, _ = synthetic.render(K, T, world, H, W)
    disp = jnp.where(depth > 0.1, K.bf / jnp.maximum(depth, 0.1), 0.0)
    pts = gstereo.triangulate_image(K, disp, cam)
    corrected = gstereo.correct_pitch(pts, jnp.asarray(pitch), cam)
    ys = np.asarray(corrected.xyz[..., 1])
    m = np.asarray(pts.valid) & (np.asarray(depth) > 2) & (np.asarray(depth) < 40)
    spread_before = np.std(np.asarray(pts.xyz[..., 1])[m])
    # ground y nearly constant after correction at mid-depths
    assert np.std(ys[m]) < spread_before
    assert abs(np.mean(ys[m]) - 1.65) < 0.2


def test_fused_aggregation_matches_per_direction_blocked():
    """The single-scan fused aggregation (all 4 directions in one
    recurrence) must compute exactly the same path costs as running the
    blocked bidirectional scan separately per axis."""
    key = jax.random.PRNGKey(7)
    vol = jax.random.uniform(key, (40, 48, 16), jnp.float32) * 100.0
    cfg = SgbmConfig(num_disparities=16, scan_block=8, scan_halo=4)
    p1, p2 = float(cfg.p1) / 16.0, float(cfg.p2) / 16.0
    fused = sgbm._aggregate(vol, cfg)
    ref = sgbm._sgm_scan_bidir_blocked(vol, p1, p2, 8, 4)
    ref = ref + jnp.swapaxes(
        sgbm._sgm_scan_bidir_blocked(jnp.swapaxes(vol, 0, 1), p1, p2, 8, 4),
        0, 1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=0, atol=1e-4)
