"""Dump a few golden-world frames to PNG for visual inspection."""
import numpy as np
import jax
import jax.numpy as jnp
from semantic_slam_mapping_tpu.config import default_config
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic

H, W = 376, 1248
cfg = default_config()
K = Intrinsics.from_config(cfg.camera)
poses = synthetic.loop_trajectory(200, radius=30.0, laps=1.25,
                                  pitch_amp=0.006)
for nb in (48, 144):
    world = synthetic.make_loop_world(jax.random.PRNGKey(7), n_boxes=nb,
                                      radius=30.0, n_moving=6)
    seq = synthetic.render_sequence(K, world, poses[jnp.array([1, 5, 20, 35])], H, W)
    L = np.asarray(seq["left"])
    d = np.asarray(seq["depth"])
    for i, f in enumerate((1, 5, 20, 35)):
        img = np.clip(L[i] * 255.0 / max(L[i].max(), 1e-6), 0, 255
                      ).astype(np.uint8)
        import imageio.v2 as iio
        iio.imwrite(f"/tmp/world{nb}_f{f}.png", img)
        dd = d[i]
        print(f"nb={nb} f{f}: depth med {np.median(dd):.1f} "
              f"frac<40m {(dd < 40).mean():.2f} lum std {L[i].std():.3f}")
