import pytest
import jax
import numpy as np

from semantic_slam_mapping_tpu.frontend import tracker
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.utils import metrics

from tests.test_tracker import CAM, CFG, H, W


@pytest.mark.slow
def test_batched_matches_sequential():
    """Batched window tracking must produce the same trajectory as the
    per-frame path (same VO inputs; the RANSAC keys differ, so allow the
    RANSAC-level tolerance)."""
    K = Intrinsics.from_config(CAM)
    world = synthetic.make_world(jax.random.PRNGKey(20), n_boxes=14)
    poses = synthetic.straight_trajectory(6, speed=0.5, yaw_rate=0.004)
    seq = synthetic.render_sequence(K, world, poses, H, W)

    # sequential
    st = tracker.TrackerState.initial()
    est_seq = []
    key = jax.random.PRNGKey(0)
    for i in range(1, 6):
        key, k = jax.random.split(key)
        st, out = tracker.track_frame(
            st, seq["left"][i], seq["right"][i],
            seq["left"][i - 1], seq["right"][i - 1], K, k, CFG)
        est_seq.append(np.asarray(out.pose))

    # batched
    st2 = tracker.TrackerState.initial()
    st2, outb = tracker.track_frames_batched(
        st2, seq["left"], seq["right"], K, jax.random.PRNGKey(0), CFG)
    est_b = np.asarray(outb.pose)

    assert est_b.shape == (5, 4, 4)
    assert bool(outb.vo_success.all())
    gt = np.asarray(seq["poses"])[1:]
    ate_seq = metrics.absolute_trajectory_error(np.stack(est_seq), gt).rmse
    ate_b = metrics.absolute_trajectory_error(est_b, gt).rmse
    # both track; batched within 2x of sequential accuracy
    assert ate_b < max(2.0 * ate_seq, 0.3), (ate_b, ate_seq)
    # final states agree to RANSAC noise
    d = np.linalg.norm(np.asarray(st.pose)[:3, 3]
                       - np.asarray(st2.pose)[:3, 3])
    assert d < 0.3, d
