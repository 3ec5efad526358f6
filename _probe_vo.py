"""Per-frame VO health at the golden operating point (TPU)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.config import default_config
from semantic_slam_mapping_tpu.frontend import tracker
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.utils import metrics

H, W = 376, 1248
F = 48
START = 0    # set >0 to probe a later arc of the circle
cfg = default_config()
K = Intrinsics.from_config(cfg.camera)

world = synthetic.make_loop_world(jax.random.PRNGKey(7), n_boxes=48,
                                  radius=30.0, n_moving=6)
poses = synthetic.loop_trajectory(200, radius=30.0, laps=1.25,
                                  pitch_amp=0.006)[START:START + F]
seq = synthetic.render_sequence(K, world, poses, H, W, start_index=START)
left = seq["left"]; right = seq["right"]
gt = np.asarray(poses)
print("rendered", flush=True)

state = tracker.TrackerState.initial(cfg)
step = jax.jit(lambda st, l, r, pl, pr, k: tracker.track_frame(
    st, l, r, pl, pr, K, k, cfg))
key = jax.random.PRNGKey(0)
est = [np.eye(4)]
for i in range(1, F):
    key, k = jax.random.split(key)
    state, out = step(state, left[i], right[i], left[i - 1], right[i - 1], k)
    est.append(np.asarray(out.pose))
    T_gt = np.linalg.inv(gt[i - 1]) @ gt[i]
    T_est = np.asarray(out.T_delta)
    # angle between
    dt = np.linalg.norm(T_gt[:3, 3] - np.linalg.inv(T_est)[:3, 3])
    print(f"f{START + i}: ok={int(out.vo_success)} m={int(out.n_matches)} "
          f"inl={int(out.n_inliers)} dT={dt:.3f}", flush=True)
ate = metrics.absolute_trajectory_error(np.stack(est), gt).rmse
print("ATE", round(float(ate), 3))
