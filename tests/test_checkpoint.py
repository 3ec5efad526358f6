import jax
import numpy as np
import pytest

from semantic_slam_mapping_tpu.utils import checkpoint
from semantic_slam_mapping_tpu.utils.timing import StageTimer


def test_slam_checkpoint_roundtrip(tmp_path):
    # reuse the pipeline test scene/config to produce a real system state
    from tests.test_pipeline import CFG, H, N_FRAMES, W, seq_and_vocab
    from semantic_slam_mapping_tpu.io import synthetic
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.pipeline import SlamSystem

    K = Intrinsics.from_config(CFG.camera)
    world = synthetic.make_world(jax.random.PRNGKey(30), n_boxes=16)
    poses = synthetic.straight_trajectory(8, speed=0.45, yaw_rate=0.01)
    seq = synthetic.render_sequence(K, world, poses, H, W)

    sys1 = SlamSystem(CFG)
    for i in range(8):
        sys1.process_frame(seq["left"][i], seq["right"][i])

    p = tmp_path / "ckpt.npz"
    checkpoint.save_slam(p, sys1)
    sys2 = checkpoint.load_slam(p, CFG)

    assert len(sys2.keyframes) == len(sys1.keyframes)
    assert sys2.n_edges == sys1.n_edges
    assert sys2.frame_count == sys1.frame_count
    np.testing.assert_allclose(np.asarray(sys2.state.pose),
                               np.asarray(sys1.state.pose), atol=1e-6)
    np.testing.assert_allclose(np.stack(sys2.trajectory),
                               np.stack(sys1.trajectory), atol=1e-6)
    np.testing.assert_array_equal(sys2.keyframes[0].feat_desc,
                                  sys1.keyframes[0].feat_desc)

    # resumed system keeps processing
    out = sys2.process_frame(seq["left"][7], seq["right"][7])
    # first call after resume primes nothing (prev buffer lost) -> None
    assert out is None
    out = sys2.process_frame(seq["left"][7], seq["right"][7])
    assert out is not None


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        x = sum(range(1000))
    t.add("frames", 3)
    s = t.summary()
    assert s["a"]["calls"] == 1 and s["a"]["total_s"] >= 0
    assert "frames" in t.report()
