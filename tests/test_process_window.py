import pytest
import jax
import numpy as np

from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.pipeline import SlamSystem
from semantic_slam_mapping_tpu.utils import metrics

from tests.test_pipeline import CFG, H, W


@pytest.mark.slow
def test_process_window_equivalent_keyframing():
    """Window-batched pipeline produces a full trajectory and inserts
    keyframes like the per-frame path."""
    K = Intrinsics.from_config(CFG.camera)
    world = synthetic.make_world(jax.random.PRNGKey(80), n_boxes=14)
    poses = synthetic.straight_trajectory(9, speed=0.5)
    seq = synthetic.render_sequence(K, world, poses, H, W)

    s = SlamSystem(CFG)
    s.process_window(seq["left"][:5], seq["right"][:5])   # pairs 0-3
    s.process_window(seq["left"][4:9], seq["right"][4:9])  # pairs 4-7
    traj = s.finish()
    assert traj.shape[0] == 9
    assert len(s.keyframes) >= 2
    ate = metrics.absolute_trajectory_error(traj, np.asarray(seq["poses"]))
    assert ate.rmse < 0.6, ate
