"""Checkpoint/resume of the full SLAM state.

The reference can only export a final ``traj.g2o`` and a PCD map — there is
no resume of any kind (SURVEY.md §5 checkpoint row; looper save/load are
empty stubs, looper.h:52-53). Here the complete engine state — keyframe
database (poses, BoW, features, images), pose graph, tracker state, and
trajectory — round-trips through one compressed npz, enabling restart,
offline backend re-optimization, and the multi-host hand-off story.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.backend import pose_graph as pg
from semantic_slam_mapping_tpu.frontend import tracker as trk
from semantic_slam_mapping_tpu.frontend.uvdisparity import PitchKalmanState


def save_slam(path: str | Path, system) -> None:
    """Serialize a pipeline.SlamSystem."""
    if hasattr(system, "_drain_all"):
        system._drain_all()   # deferred edges/loops/map inserts land first
    kfs = system.keyframes
    data = dict(
        n_keyframes=np.int64(len(kfs)),
        n_edges=np.int64(system.n_edges),
        frame_count=np.int64(system.frame_count),
        local_error=np.float64(system.local_error),
        loop_error=np.float64(system.loop_error),
        trajectory=np.stack(system.trajectory) if system.trajectory
        else np.zeros((0, 4, 4)),
        graph_poses=np.asarray(system.graph.poses),
        graph_vertex_valid=np.asarray(system.graph.vertex_valid),
        graph_edge_i=np.asarray(system.graph.edge_i),
        graph_edge_j=np.asarray(system.graph.edge_j),
        graph_edge_T=np.asarray(system.graph.edge_T),
        graph_edge_info=np.asarray(system.graph.edge_info),
        graph_edge_valid=np.asarray(system.graph.edge_valid),
        graph_edge_is_loop=np.asarray(system.graph.edge_is_loop),
        tracker_status=np.asarray(system.state.status),
        tracker_pose=np.asarray(system.state.pose),
        tracker_velocity=np.asarray(system.state.velocity),
        tracker_lost=np.asarray(system.state.lost_count),
        tracker_kf_x=np.asarray(system.state.pitch_kf.x),
        tracker_kf_P=np.asarray(system.state.pitch_kf.P),
        tracker_frame_index=np.asarray(system.state.frame_index),
    )
    for i, kf in enumerate(kfs):
        p = f"kf{i}_"
        data[p + "pose"] = kf.pose
        data[p + "frame_index"] = np.int64(kf.frame_index)
        data[p + "feat_xy"] = kf.feat_xy
        data[p + "feat_desc"] = kf.feat_desc
        data[p + "feat_xyz"] = kf.feat_xyz
        data[p + "feat_valid"] = kf.feat_valid
        data[p + "left"] = kf.left
        if kf.right is not None:      # RGB-D keyframes carry no right image
            data[p + "right"] = kf.right
        if kf.bow_idx is not None:
            data[p + "bow_idx"] = kf.bow_idx
            data[p + "bow_w"] = kf.bow_w
        if kf.disparity is not None:
            data[p + "disparity"] = kf.disparity
        # mapping inputs (VERDICT r1 item 9: a resumed run must be able to
        # keep producing a colored, semantics-filtered map)
        if kf.color is not None:
            data[p + "color"] = kf.color
        if kf.semantic is not None:
            data[p + "semantic"] = kf.semantic
    np.savez_compressed(path, **data)


def load_slam(path: str | Path, cfg, vocab=None):
    """Restore a pipeline.SlamSystem (config + vocab supplied by caller —
    they are code/artifacts, not state)."""
    from semantic_slam_mapping_tpu.pipeline import Keyframe, SlamSystem

    z = np.load(path, allow_pickle=False)
    system = SlamSystem(cfg, vocab=vocab)
    system.n_edges = int(z["n_edges"])
    system.frame_count = int(z["frame_count"])
    system.local_error = float(z["local_error"])
    system.loop_error = float(z["loop_error"])
    system.trajectory = list(z["trajectory"])
    # pipeline keeps the graph as mutable host numpy (see SlamSystem)
    system.graph = pg.PoseGraph(
        poses=np.array(z["graph_poses"], np.float32),
        vertex_valid=np.array(z["graph_vertex_valid"]),
        edge_i=np.array(z["graph_edge_i"], np.int32),
        edge_j=np.array(z["graph_edge_j"], np.int32),
        edge_T=np.array(z["graph_edge_T"], np.float32),
        edge_info=np.array(z["graph_edge_info"], np.float32),
        edge_valid=np.array(z["graph_edge_valid"]),
        edge_is_loop=np.array(z["graph_edge_is_loop"]))
    system.state = trk.TrackerState(
        status=jnp.asarray(z["tracker_status"]),
        pose=jnp.asarray(z["tracker_pose"]),
        velocity=jnp.asarray(z["tracker_velocity"]),
        lost_count=jnp.asarray(z["tracker_lost"]),
        pitch_kf=PitchKalmanState(x=jnp.asarray(z["tracker_kf_x"]),
                                  P=jnp.asarray(z["tracker_kf_P"])),
        frame_index=jnp.asarray(z["tracker_frame_index"]))
    n = int(z["n_keyframes"])
    for i in range(n):
        p = f"kf{i}_"
        get = lambda k: z[p + k] if p + k in z else None  # noqa: E731
        system.keyframes.append(Keyframe(
            kf_id=i,
            frame_index=int(z[p + "frame_index"]),
            pose=z[p + "pose"],
            bow_idx_host=get("bow_idx"),
            bow_w_host=get("bow_w"),
            feat_xy_host=z[p + "feat_xy"],
            feat_desc_host=z[p + "feat_desc"],
            feat_xyz_host=z[p + "feat_xyz"],
            feat_valid_host=z[p + "feat_valid"],
            left_host=z[p + "left"],
            right_host=get("right"),
            color=get("color"),
            semantic_host=get("semantic"),
            disparity_host=get("disparity")))
    # rebuild the relocalization ref deque from the newest keyframes
    for kf in system.keyframes[-system.ref_frames.maxlen:]:
        system.ref_frames.append(kf)
    return system
