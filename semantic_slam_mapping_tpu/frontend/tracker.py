"""Tracking frontend: per-frame state machine over the stereo VO stack.

Replaces the reference's ``Tracker`` (reference: src/track.cpp — dispatch
``updateFrame`` :8-28; active path ``estimateVO`` :38-137: constant-velocity
prediction :41, GFTT+KLT quad matching :45-55, viso ``Process`` :59,
triangulation + U-V-disparity moving mask :67-79, pose integration
``pose = pose * inv(M)`` :82-87,123-128, speed update + bounded ref deque
:130-136, lost counting :113-121; states NOT_READY/OK/LOST track.h:55-60;
``lostRecover`` :202-212).

TPU design: the whole per-frame update is ONE jitted function over a pure
``TrackerState`` pytree — no mutexes, no mutable frame objects. Sequences
are processed by scanning this step over the frame stream; the moving-object
mask and per-frame diagnostics come out as part of the step output. The
relocalization entry point ``adjust`` (track.h:114-131, called by the
backend after optimization) is a pure state rewrite.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import SlamConfig
from semantic_slam_mapping_tpu.frontend import quadmatch, uvdisparity as uvd
from semantic_slam_mapping_tpu.frontend import vo
from semantic_slam_mapping_tpu.geometry import se3, stereo as gstereo
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.ops import sgbm

# status codes (track.h:55-60)
NOT_READY = 0
OK = 1
LOST = 2


def _velocity_flow_prior(velocity: jnp.ndarray, K: Intrinsics,
                         cfg: SlamConfig) -> jnp.ndarray:
    """Constant-velocity temporal KLT seeding (the reference's motion
    prediction role, track.cpp:41): expected image flow of a mid-depth
    point at the principal ray under the previous inter-frame motion.
    Seeds the lc->lp legs so large inter-frame flows start near the
    solution instead of at zero. Identity velocity -> zero prior."""
    from semantic_slam_mapping_tpu.geometry.camera import project
    z_nom = jnp.asarray(0.5 * cfg.camera.roiz, jnp.float32)
    Xc = jnp.array([[0.0, 0.0, 1.0]]) * z_nom
    # velocity maps prev-cam -> cur-cam; the temporal legs track cur -> prev
    Xp = se3.transform_points(se3.inverse(velocity), Xc)
    return project(K, Xp)[0] - jnp.array([K.cx, K.cy])


class TrackerState(NamedTuple):
    status: jnp.ndarray        # int32 scalar
    pose: jnp.ndarray          # (4, 4) T_w_c camera-to-world
    velocity: jnp.ndarray      # (4, 4) last inter-frame motion (prev->cur)
    lost_count: jnp.ndarray    # int32 scalar
    pitch_kf: uvd.PitchKalmanState
    frame_index: jnp.ndarray   # int32 scalar

    @classmethod
    def initial(cls, cfg: Optional[SlamConfig] = None) -> "TrackerState":
        p0 = cfg.uvdisparity.kf_error_cov_post if cfg is not None else 1.0
        return cls(status=jnp.int32(NOT_READY),
                   pose=se3.identity(),
                   velocity=se3.identity(),
                   lost_count=jnp.int32(0),
                   pitch_kf=uvd.PitchKalmanState.init(p0),
                   frame_index=jnp.int32(0))


class FrameResult(NamedTuple):
    pose: jnp.ndarray          # (4, 4) world pose after this frame
    T_delta: jnp.ndarray       # (4, 4) estimated inter-frame motion
    status: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    moving_mask: jnp.ndarray   # (H, W) bool
    disparity: jnp.ndarray     # (H, W)
    matches: vo.QuadMatches
    vo_success: jnp.ndarray
    pitch: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def track_frame(state: TrackerState,
                cur_left: jnp.ndarray, cur_right: jnp.ndarray,
                prev_left: jnp.ndarray, prev_right: jnp.ndarray,
                K: Intrinsics, key: jax.Array,
                cfg: SlamConfig) -> Tuple[TrackerState, FrameResult]:
    """One full frontend step (the estimateVO path, track.cpp:38-137)."""
    # ---- dense stereo (the FrameReader's SGBM role, rgbdframe.cpp:80-116)
    sg = sgbm.compute(cur_left, cur_right, cfg.sgbm)
    disparity = jnp.where(sg.valid, sg.disparity, 0.0)

    # ---- quad matching seeded by disparity + constant-velocity flow ----
    m = quadmatch.quad_match(
        cur_left=cur_left, cur_right=cur_right,
        prev_left=prev_left, prev_right=prev_right,
        qcfg=cfg.quadmatch, gcfg=cfg.gftt, kcfg=cfg.klt,
        cur_disparity=disparity,
        flow_prior=_velocity_flow_prior(state.velocity, K, cfg))

    # ---- RANSAC + GN motion ----
    res = vo.estimate_motion(m, K, key, cfg.vo)

    # ---- triangulation + pitch feedback + moving-object mask ----
    # Reference Process order (uvdisparity.cpp:842-874): measure the pitch,
    # smooth it with the persistent Kalman filter, rotate the 3D field by
    # the SMOOTHED pitch (correct3DPoints, stereo.cpp:127-181), re-filter
    # the ROI on the corrected points, then run U-disparity segmentation.
    pts = gstereo.triangulate_image(K, disparity, cfg.camera)
    pitch_meas, line_a, line_b = uvd.measure_pitch(
        disparity, sg.valid, pts.roi, K, cfg.sgbm.num_disparities,
        cfg.uvdisparity)
    kf = uvd.pitch_kalman_update(state.pitch_kf, pitch_meas[None],
                                 cfg.uvdisparity)
    pts_c = gstereo.correct_pitch(pts, kf.x[0], cfg.camera)
    inl_uv = m.lc
    out_uv = m.lc
    uv_res = uvd.detect_moving_objects(
        disparity, sg.valid, pts_c.roi,
        inl_uv, m.valid & res.inliers,
        out_uv, m.valid & ~res.inliers, K,
        num_disparities=cfg.sgbm.num_disparities, cfg=cfg.uvdisparity,
        line_ab=(line_a, line_b))

    # ---- pose integration / state machine ----
    # (unlike the reference's updateFrame, this step always receives a
    # (current, previous) pair, so even the first call integrates motion;
    # NOT_READY only means "no velocity prior yet")
    first = state.status == NOT_READY
    ok = res.success

    # success: pose <- pose * inv(T_delta)   (track.cpp:82-87)
    pose_ok = se3.compose(state.pose, se3.inverse(res.T_delta))
    # failure: constant-velocity prediction   (track.cpp:113-121)
    pose_pred = se3.compose(state.pose, se3.inverse(state.velocity))
    new_pose = se3.orthonormalize(jnp.where(ok, pose_ok, pose_pred))

    new_velocity = jnp.where(ok, res.T_delta, state.velocity)
    new_lost = jnp.where(ok | first, 0, state.lost_count + 1)
    new_status = jnp.where(
        new_lost > cfg.tracker.max_lost_frames, LOST, OK).astype(jnp.int32)

    new_state = TrackerState(
        status=new_status, pose=new_pose, velocity=new_velocity,
        lost_count=new_lost.astype(jnp.int32), pitch_kf=kf,
        frame_index=state.frame_index + 1)
    out = FrameResult(
        pose=new_pose, T_delta=res.T_delta, status=new_status,
        n_matches=jnp.sum(m.valid), n_inliers=res.n_inliers,
        moving_mask=uv_res.moving_mask, disparity=disparity,
        matches=m, vo_success=res.success, pitch=uv_res.pitch)
    return new_state, out


def window_core(state: TrackerState,
                cur_l: jnp.ndarray, cur_r: jnp.ndarray,
                prev_l: jnp.ndarray, prev_r: jnp.ndarray,
                K: Intrinsics, keys: jax.Array, cfg: SlamConfig,
                axis_name: Optional[str] = None
                ) -> Tuple[TrackerState, FrameResult]:
    """Window frontend over B_local frame pairs (already split cur/prev).

    The single implementation behind both the single-device batched mode
    and the multi-chip sharded mode (parallel/sharded_frontend.py): with
    ``axis_name`` set, this runs inside `shard_map` on a (B/n)-pair local
    shard; the heavy per-pair stages stay local while the two tiny
    sequential recurrences (pitch Kalman, pose integration) run on
    all-gathered per-pair scalars, replicated on every device — the
    collective traffic is O(B) scalars + 4x4s, nothing image-sized.
    """
    B_local = cur_l.shape[0]
    if axis_name is None:
        gather = lambda x: x                          # noqa: E731
        lo = 0
    else:
        gather = lambda x: jax.lax.all_gather(        # noqa: E731
            x, axis_name, tiled=True)
        lo = jax.lax.axis_index(axis_name) * B_local

    sg = jax.vmap(lambda l, r: sgbm.compute(l, r, cfg.sgbm))(cur_l, cur_r)
    disparity = jnp.where(sg.valid, sg.disparity, 0.0)

    # constant-velocity flow prior from the window-entry velocity (the
    # per-frame velocities are only known after the scan; a window-stale
    # seed still recovers large flows)
    fp = _velocity_flow_prior(state.velocity, K, cfg)
    m = jax.vmap(lambda cl, cr, pl, pr, d: quadmatch.quad_match(
        cur_left=cl, cur_right=cr, prev_left=pl, prev_right=pr,
        qcfg=cfg.quadmatch, gcfg=cfg.gftt, kcfg=cfg.klt,
        cur_disparity=d, flow_prior=fp))(
            cur_l, cur_r, prev_l, prev_r, disparity)

    res = jax.vmap(lambda mm, k: vo.estimate_motion(mm, K, k, cfg.vo))(
        m, keys)

    # ---- pitch feedback (reference uvdisparity.cpp:842-874): the Kalman
    # filter is inherently sequential across the window, but the pitch
    # MEASUREMENT (V-disparity + line fit) is per-frame independent — so
    # measure under vmap, scan the (tiny) KF over the B measurements, then
    # run the heavy correction + U-disparity detection under vmap again
    # with each frame's smoothed pitch.
    pts = jax.vmap(lambda d: gstereo.triangulate_image(K, d, cfg.camera))(
        disparity)
    pitch_meas, line_a, line_b = jax.vmap(
        lambda d, v, roi: uvd.measure_pitch(
            d, v, roi, K, cfg.sgbm.num_disparities, cfg.uvdisparity))(
                disparity, sg.valid, pts.roi)

    def kf_step(kf, meas):
        kf2 = uvd.pitch_kalman_update(kf, meas[None], cfg.uvdisparity)
        return kf2, kf2.x[0]

    kf_final, pitch_smooth = jax.lax.scan(kf_step, state.pitch_kf,
                                          gather(pitch_meas))
    pitch_local = jax.lax.dynamic_slice_in_dim(pitch_smooth, lo, B_local)

    pts_roi = jax.vmap(
        lambda p, ps: gstereo.correct_pitch(p, ps, cfg.camera).roi)(
            pts, pitch_local)
    uv_res = jax.vmap(
        lambda d, v, roi, mm, inl, la, lb: uvd.detect_moving_objects(
            d, v, roi, mm.lc, mm.valid & inl, mm.lc, mm.valid & ~inl, K,
            num_disparities=cfg.sgbm.num_disparities, cfg=cfg.uvdisparity,
            line_ab=(la, lb)))(
        disparity, sg.valid, pts_roi, m, res.inliers, line_a, line_b)

    # ---- sequential state machine over all B results (cheap; replicated
    # on every device in sharded mode) ----
    def step(st: TrackerState, inp):
        T_delta, success = inp
        first = st.status == NOT_READY
        ok = success
        pose_ok = se3.compose(st.pose, se3.inverse(T_delta))
        pose_pred = se3.compose(st.pose, se3.inverse(st.velocity))
        new_pose = se3.orthonormalize(jnp.where(ok, pose_ok, pose_pred))
        new_velocity = jnp.where(ok, T_delta, st.velocity)
        new_lost = jnp.where(ok | first, 0, st.lost_count + 1)
        new_status = jnp.where(new_lost > cfg.tracker.max_lost_frames,
                               LOST, OK).astype(jnp.int32)
        new_st = TrackerState(
            status=new_status, pose=new_pose, velocity=new_velocity,
            lost_count=new_lost.astype(jnp.int32), pitch_kf=st.pitch_kf,
            frame_index=st.frame_index + 1)
        return new_st, (new_pose, new_status)

    state, (poses, statuses) = jax.lax.scan(
        step, state._replace(pitch_kf=kf_final),
        (gather(res.T_delta), gather(res.success)))

    out = FrameResult(
        pose=poses, T_delta=res.T_delta, status=statuses,
        n_matches=jnp.sum(m.valid, axis=-1), n_inliers=res.n_inliers,
        moving_mask=uv_res.moving_mask, disparity=disparity,
        matches=m, vo_success=res.success, pitch=uv_res.pitch)
    return state, out


@partial(jax.jit, static_argnames=("cfg",))
def track_frames_batched(state: TrackerState,
                         lefts: jnp.ndarray, rights: jnp.ndarray,
                         K: Intrinsics, key: jax.Array,
                         cfg: SlamConfig) -> Tuple[TrackerState, FrameResult]:
    """Throughput mode: process a window of B consecutive frames in one
    program. All heavy per-frame stages (SGBM, quad matching, RANSAC VO,
    U-V-disparity) are independent across frames and run under `vmap` —
    batching them fills the chip where a single KITTI frame is latency/
    bandwidth-bound — while the (cheap) pose-integration state machine
    runs as a `lax.scan` over the VO results.

    lefts/rights: (B+1, H, W) frames; produces results for the B pairs
    (i-1, i). This is the TPU answer to the reference's three-thread
    latency hiding (SURVEY.md §2.3 pipeline-staging row): batch-level
    parallelism inside one device program, deterministic by construction.
    The multi-chip variant shards the pair axis over the mesh data axis
    (parallel/sharded_frontend.py).
    """
    B = lefts.shape[0] - 1
    keys = jax.random.split(key, B)
    return window_core(state, lefts[1:], rights[1:],
                       lefts[:-1], rights[:-1], K, keys, cfg)


def adjust(state: TrackerState, new_pose: jnp.ndarray) -> TrackerState:
    """Backend-initiated relocalization: rewrite the frontend pose after a
    pose-graph optimization (Tracker::adjust, track.h:114-131; called from
    pose_graph.cpp:298-302)."""
    return state._replace(pose=se3.orthonormalize(new_pose),
                          lost_count=jnp.int32(0),
                          status=jnp.int32(OK))


def lost_recover(state: TrackerState, last_good_pose: jnp.ndarray
                 ) -> TrackerState:
    """Re-seed at the last reference pose (lostRecover, track.cpp:202-212)."""
    return adjust(state, last_good_pose)
