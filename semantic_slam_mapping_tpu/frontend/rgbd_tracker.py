"""RGB-D (TUM) tracking frontend: ORB matching + PnP motion-only BA.

The reference's second tracking path: TUM RGB-D frames (rgbdframe.cpp:
199-227) tracked by the ``trackRefFrame`` scheme (track.cpp:140-200): match
the current frame's ORB features against a bounded DEQUE of reference
frames (size ``tracker_ref_frames``, parameters.txt:81), pool all 3D-2D
correspondences into one PnP "local BA", integrate the pose, and push the
current frame into the deque on success (track.cpp:186-196 — failures are
not pushed).

TPU design: one jitted step over a pure state pytree. The ref deque is a
fixed-size ring buffer of feature blocks inside the state; matching runs
vmapped over the R slots and the pooled (R*N) correspondence set feeds a
single fixed-shape PnP solve — the reference's per-ref sequential matching
loop becomes one batched device program.
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
from semantic_slam_mapping_tpu.ops import matching, orb
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
    # reference-frame ring buffer (refFrames deque, track.cpp:130-136):
    # R slots of fixed-N feature blocks; 3D positions in WORLD frame so
    # pooled correspondences share one PnP vertex.
    ref_desc: jnp.ndarray        # (R, N, 256) uint8
    ref_xy: jnp.ndarray          # (R, N, 2)
    ref_xyz_w: jnp.ndarray       # (R, N, 3) world-frame 3D
    ref_valid: jnp.ndarray       # (R, N)
    ref_ptr: jnp.ndarray         # int32 next write slot

    @classmethod
    def initial(cls, n_features: int,
                ref_frames: int = 5) -> "RgbdTrackerState":
        return cls(status=jnp.int32(NOT_READY),
                   pose=se3.identity(),
                   velocity=se3.identity(),
                   lost_count=jnp.int32(0),
                   frame_index=jnp.int32(0),
                   ref_desc=jnp.zeros((ref_frames, n_features,
                                       orb.DESC_BITS), jnp.uint8),
                   ref_xy=jnp.zeros((ref_frames, n_features, 2)),
                   ref_xyz_w=jnp.zeros((ref_frames, n_features, 3)),
                   ref_valid=jnp.zeros((ref_frames, n_features), bool),
                   ref_ptr=jnp.int32(0))


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
    """One RGB-D tracking step: ORB extract -> match against the ref deque
    -> pooled PnP (world 3D vs current 2D) -> pose integration -> push the
    frame into the deque on success (trackRefFrame, track.cpp:140-200)."""
    feats = orb.extract(gray, cfg.orb)
    d = bilinear_sample(depth, feats.xy)
    has_depth = (d > 0.05) & (d < 50.0)
    xyz_cam = backproject(K, feats.xy, jnp.maximum(d, 0.05))
    feat_valid3d = feats.valid & has_depth

    # ---- match current descriptors against every ref slot (vmapped) ----
    def match_one(rd, rxyz, rv):
        m = matching.match_descriptors(rd, feats.desc, rv, feats.valid,
                                       ratio=cfg.orb.knn_match_ratio)
        idx = jnp.clip(m.idx, 0, feats.xy.shape[0] - 1)
        return rxyz, feats.xy[idx], m.valid & rv

    obj, img, pair_valid = jax.vmap(match_one)(
        state.ref_desc, state.ref_xyz_w, state.ref_valid)
    obj = obj.reshape(-1, 3)
    img = img.reshape(-1, 2)
    pair_valid = pair_valid.reshape(-1)
    n_matches = jnp.sum(pair_valid)

    # ---- one PnP over the pooled set: obj is world-frame, so the solved
    # transform is T_cur<-world and pose = inv(T) directly ----
    pose_pred = se3.compose(state.pose, se3.inverse(state.velocity))
    T_init = se3.inverse(pose_pred)
    res = pnp_mod.solve_pnp(obj, img, pair_valid, K, T_init, cfg.pnp)
    # reference gates: img.size() >= 15 and inliers >= 15 (track.cpp:158-176)
    success = (res.success & (n_matches >= cfg.pnp.min_matches)
               & (res.n_inliers >= cfg.pnp.min_inliers))

    first = state.status == NOT_READY
    ok = success & ~first

    pose_ok = se3.inverse(res.T)
    pose_pred_or_hold = jnp.where(first, state.pose, pose_pred)
    new_pose = se3.orthonormalize(
        jnp.where(ok, pose_ok, pose_pred_or_hold))
    # velocity: prev->cur motion in the stereo tracker's convention
    # (pose_new = pose_old o inv(velocity))
    T_delta = se3.compose(se3.inverse(new_pose), state.pose)
    new_velocity = jnp.where(ok, T_delta, state.velocity)
    new_lost = jnp.where(ok | first, 0, state.lost_count + 1)
    new_status = jnp.where(new_lost > cfg.tracker.max_lost_frames,
                           LOST, OK).astype(jnp.int32)

    # ---- push current frame into the ring buffer on success/first
    # (track.cpp:186-196: failed frames are not pushed) ----
    xyz_w = se3.transform_points(new_pose, xyz_cam)
    R = state.ref_desc.shape[0]
    slot = state.ref_ptr % R
    push = ok | first

    def ins(buf, row):
        new = jax.lax.dynamic_update_index_in_dim(buf, row, slot, 0)
        return jnp.where(push, new, buf)

    new_state = RgbdTrackerState(
        status=new_status, pose=new_pose, velocity=new_velocity,
        lost_count=new_lost.astype(jnp.int32),
        frame_index=state.frame_index + 1,
        ref_desc=ins(state.ref_desc, feats.desc),
        ref_xy=ins(state.ref_xy, feats.xy),
        ref_xyz_w=ins(state.ref_xyz_w, xyz_w),
        ref_valid=ins(state.ref_valid, feat_valid3d),
        ref_ptr=jnp.where(push, state.ref_ptr + 1, state.ref_ptr))
    out = RgbdFrameResult(pose=new_pose, T_delta=T_delta, status=new_status,
                          n_matches=n_matches,
                          n_inliers=res.n_inliers, success=success)
    return new_state, out


@jax.jit
def adjust(state: RgbdTrackerState, new_pose: jnp.ndarray
           ) -> RgbdTrackerState:
    """Backend-initiated relocalization (Tracker::adjust, track.h:114-131)
    for the RGB-D tracker. Unlike the stereo tracker (whose VO is purely
    relative), this tracker's ref ring buffer holds WORLD-frame 3D points,
    and its pooled PnP is an ABSOLUTE solve against them — so the pose
    rewrite must transport the stored points by the same world correction
    C = new_pose o inv(old_pose), keeping the whole state equivariant
    (otherwise the next PnP 'snaps back' toward the pre-correction frame,
    and pipelined/serial drivers diverge)."""
    new_pose = se3.orthonormalize(jnp.asarray(new_pose, jnp.float32))
    C = se3.compose(new_pose, se3.inverse(state.pose))
    R_, N_ = state.ref_xyz_w.shape[:2]
    pts = se3.transform_points(C, state.ref_xyz_w.reshape(-1, 3))
    return state._replace(pose=new_pose,
                          ref_xyz_w=pts.reshape(R_, N_, 3),
                          lost_count=jnp.int32(0),
                          status=jnp.int32(OK))
