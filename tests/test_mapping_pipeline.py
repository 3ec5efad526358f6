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


def test_kf_cloud_u8_color_not_saturated():
    """uint8 [0,255] keyframe color must survive the cloud quantization
    (regression: an unconditional f32 cast made every u8 channel >= 1.0
    saturate in the *255 output quantization — uniformly white map)."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from semantic_slam_mapping_tpu.config import CameraConfig, default_config
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.pipeline import _kf_cloud_jit

    H, W = 64, 128
    cam = CameraConfig(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2, baseline=0.5)
    cfg = default_config()
    K = Intrinsics.from_config(cam)
    disp = jnp.full((H, W), 10.0, jnp.float16)
    left = jnp.full((H, W), 0.5, jnp.float16)
    u8 = jnp.broadcast_to(jnp.asarray([100, 150, 200], jnp.uint8),
                          (H, W, 3))
    for color in (u8, u8.astype(jnp.float32) / 255.0):   # both contracts
        _, rgb, _, n = _kf_cloud_jit(disp, left, color, None, None, K,
                                     cam, cfg.mapper, 4096)
        r = np.asarray(rgb)[: int(n)]
        assert len(r) > 0
        np.testing.assert_allclose(r[0], [100, 150, 200], atol=1)
