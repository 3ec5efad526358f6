"""RGB-D (TUM) tracking frontend: ORB matching + PnP motion-only BA.

The reference's second tracking path: TUM RGB-D frames (rgbdframe.cpp:
199-227) tracked by ORB feature matching against reference frames + PnP
"local BA" (the trackRefFrame path, track.cpp:140-200, and the test_pnp /
match_orbfeature_tum entry points, experiment/test_pnp.cpp). The stereo
quad-match VO path (frontend/tracker.py) does not apply to monocular
RGB-D — this is its PnP sibling, as one jitted step over a pure state
pytree carrying the previous frame's features (the reference's ref-frame
deque becomes the keyframe store at the pipeline level).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.backend import pnp as pnp_mod
from semantic_slam_mapping_tpu.config import SlamConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics, backproject
from semantic_slam_mapping_tpu.ops import orb
from semantic_slam_mapping_tpu.ops.image import bilinear_sample

NOT_READY = 0
OK = 1
LOST = 2


class RgbdTrackerState(NamedTuple):
    status: jnp.ndarray
    pose: jnp.ndarray            # (4, 4) T_w_c
    velocity: jnp.ndarray        # (4, 4) last frame-to-frame motion
    lost_count: jnp.ndarray
    frame_index: jnp.ndarray
    # previous frame's features (fixed N slots)
    prev_desc: jnp.ndarray       # (N, 256) uint8
    prev_xy: jnp.ndarray         # (N, 2)
    prev_xyz: jnp.ndarray        # (N, 3) camera-frame 3D
    prev_valid: jnp.ndarray      # (N,)

    @classmethod
    def initial(cls, n_features: int) -> "RgbdTrackerState":
        return cls(status=jnp.int32(NOT_READY),
                   pose=se3.identity(),
                   velocity=se3.identity(),
                   lost_count=jnp.int32(0),
                   frame_index=jnp.int32(0),
                   prev_desc=jnp.zeros((n_features, orb.DESC_BITS),
                                       jnp.uint8),
                   prev_xy=jnp.zeros((n_features, 2)),
                   prev_xyz=jnp.zeros((n_features, 3)),
                   prev_valid=jnp.zeros(n_features, bool))


class RgbdFrameResult(NamedTuple):
    pose: jnp.ndarray
    T_delta: jnp.ndarray
    status: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def track_frame_rgbd(state: RgbdTrackerState, gray: jnp.ndarray,
                     depth: jnp.ndarray, K: Intrinsics,
                     cfg: SlamConfig) -> Tuple[RgbdTrackerState,
                                               RgbdFrameResult]:
    """One RGB-D tracking step: ORB extract -> match to previous frame ->
    PnP (prev 3D vs current 2D) -> pose integration."""
    feats = orb.extract(gray, cfg.orb)
    d = bilinear_sample(depth, feats.xy)
    has_depth = (d > 0.05) & (d < 50.0)
    xyz = backproject(K, feats.xy, jnp.maximum(d, 0.05))
    feat_valid3d = feats.valid & has_depth

    # PnP: previous-frame 3D against current 2D, initialized from the
    # constant-velocity prior (track.cpp:41)
    info = pnp_mod.solve_pnp_lazy(
        state.prev_desc, state.prev_xyz, state.prev_valid,
        feats.desc, feats.xy, feats.valid,
        K, state.velocity, cfg.pnp, cfg.orb.knn_match_ratio)

    first = state.status == NOT_READY
    ok = info.success & ~first

    pose_ok = se3.compose(state.pose, se3.inverse(info.T))
    pose_pred = se3.compose(state.pose, se3.inverse(state.velocity))
    new_pose = se3.orthonormalize(
        jnp.where(first, state.pose, jnp.where(ok, pose_ok, pose_pred)))
    new_velocity = jnp.where(ok, info.T, state.velocity)
    new_lost = jnp.where(ok | first, 0, state.lost_count + 1)
    new_status = jnp.where(new_lost > cfg.tracker.max_lost_frames,
                           LOST, OK).astype(jnp.int32)

    new_state = RgbdTrackerState(
        status=new_status, pose=new_pose, velocity=new_velocity,
        lost_count=new_lost.astype(jnp.int32),
        frame_index=state.frame_index + 1,
        prev_desc=feats.desc, prev_xy=feats.xy, prev_xyz=xyz,
        prev_valid=feat_valid3d)
    out = RgbdFrameResult(pose=new_pose, T_delta=info.T, status=new_status,
                          n_matches=info.n_matches,
                          n_inliers=info.n_inliers, success=info.success)
    return new_state, out
