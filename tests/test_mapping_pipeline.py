import jax
import numpy as np
import pytest

from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.pipeline import SlamSystem

from tests.test_pipeline import CFG, H, W


def test_pipeline_with_mapping(tmp_path):
    K = Intrinsics.from_config(CFG.camera)
    world = synthetic.make_world(jax.random.PRNGKey(50), n_boxes=12)
    poses = synthetic.straight_trajectory(8, speed=0.5)
    seq = synthetic.render_sequence(K, world, poses, H, W)

    sys_ = SlamSystem(CFG, enable_mapping=True)
    for i in range(8):
        sys_.process_frame(seq["left"][i], seq["right"][i],
                           semantic=np.asarray(seq["semantic"][i]))
    sys_.finish()
    assert sys_.map is not None
    assert len(sys_.map) > 500
    p = tmp_path / "map.pcd"
    sys_.map.save_pcd(str(p))
    assert p.stat().st_size > 1000
    xyz, rgb, lbl = sys_.map.as_arrays()
    # all mapped points within the configured max distance of the traj
    assert np.all(np.abs(xyz[:, 0]) < 2 * CFG.mapper.max_distance + 10)
    # sky never mapped
    from semantic_slam_mapping_tpu.mapping import semantics
    assert not np.any(lbl == semantics.SKY)
