"""Synthetic stereo-world renderer with exact ground truth.

The reference has no test assets beyond full KITTI runs (SURVEY.md §4: no
automated tests at all). This module is the framework's answer: a raycast
renderer over a procedural 3D world (ground plane + boxes + backdrop) that
produces *photoconsistent* stereo pairs and temporal sequences with exact
ground-truth poses, depth/disparity, semantic labels, and moving-object
masks — enabling closed-form golden tests for every stage (SGBM vs GT
disparity, KLT vs GT flow, VO vs GT motion, UV-disparity vs GT moving mask,
ATE on whole synthetic trajectories) without dataset downloads.

Conventions: camera frame x right, y down, z forward (KITTI). World frame =
camera frame of the first view. Ground plane at y = +camera_height.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics, pixel_grid

# Semantic class ids used by the synthetic world (mirrors the 12-class SegNet
# palette roles used by the mapper filters, reference: mapper.cpp:37-55)
CLASS_SKY = 0
CLASS_ROAD = 1
CLASS_BUILDING = 2
CLASS_CAR = 3          # moving-object class (maps to reference's vehicle)
CLASS_PEDESTRIAN = 4   # reference's Pedestrian moving class (mapper.cpp:206)


class World(NamedTuple):
    """Static boxes (N, 2, 3) [min, max] world corners + per-box class ids
    (N,), ground height (scalar), backdrop depth (scalar)."""

    boxes: jnp.ndarray
    box_class: jnp.ndarray
    ground_y: jnp.ndarray
    backdrop_z: jnp.ndarray
    # moving box: its box index (static python int) or -1, and per-frame
    # velocity (3,) in world units/frame
    moving_index: int = -1
    moving_velocity: Optional[jnp.ndarray] = None


def make_world(key: jax.Array, n_boxes: int = 12, camera_height: float = 1.65,
               backdrop_z: float = 120.0, with_moving_box: bool = False) -> World:
    """Random street-like world: boxes standing on the ground, flanking a
    central corridor the camera drives through."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    side = jnp.where(jax.random.bernoulli(k1, 0.5, (n_boxes,)), 1.0, -1.0)
    cx = side * jax.random.uniform(k2, (n_boxes,), minval=4.0, maxval=14.0)
    cz = jax.random.uniform(k3, (n_boxes,), minval=6.0, maxval=90.0)
    w = jax.random.uniform(k4, (n_boxes, 3), minval=1.0, maxval=4.0)
    w = w * jnp.array([1.0, 1.5, 1.0])  # taller than wide
    ground = jnp.asarray(camera_height, jnp.float32)
    mins = jnp.stack([cx - w[:, 0], ground - w[:, 1] * 2.0, cz - w[:, 2]], axis=-1)
    maxs = jnp.stack([cx + w[:, 0],
                      jnp.full_like(cx, ground + 0.01),
                      cz + w[:, 2]], axis=-1)
    boxes = jnp.stack([mins, maxs], axis=1)
    box_class = jnp.full((n_boxes,), CLASS_BUILDING, jnp.int32)

    moving_index = -1
    moving_velocity = None
    if with_moving_box:
        # a car-sized box in the corridor ahead, moving laterally
        car_min = jnp.array([[-1.0, ground - 1.5, 14.0]])
        car_max = jnp.array([[1.0, ground, 17.0]])
        boxes = jnp.concatenate([boxes, jnp.stack([car_min, car_max], 1)], 0)
        box_class = jnp.concatenate(
            [box_class, jnp.array([CLASS_CAR], jnp.int32)])
        moving_index = n_boxes
        moving_velocity = jnp.array([0.35, 0.0, 0.1], jnp.float32)

    return World(boxes, box_class, ground, jnp.asarray(backdrop_z, jnp.float32),
                 moving_index, moving_velocity)


def _texture(p: jnp.ndarray, seed_scale: float = 1.0) -> jnp.ndarray:
    """Procedural world texture in [0, 1]: multi-octave interference pattern —
    smooth enough for LK tracking, busy enough for FAST/GFTT corners."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    v = (0.40 * jnp.sin(1.7 * x * seed_scale) * jnp.cos(1.3 * z + 0.7)
         + 0.25 * jnp.sin(3.9 * x + 2.1 * z) * jnp.sin(2.9 * y + 1.1)
         + 0.20 * jnp.sin(8.5 * x - 0.4) * jnp.cos(7.3 * z + 2.2)
         + 0.10 * jnp.sin(17.0 * (x + z)) * jnp.cos(13.0 * (x - y))
         + 0.05 * jnp.sin(31.0 * z + 5.0 * x))
    return 0.5 + 0.5 * jnp.tanh(1.5 * v)


def _intersect_boxes(origin: jnp.ndarray, direction: jnp.ndarray,
                     boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB. origin (3,), direction (..., 3), boxes (N,2,3).
    Returns (t_min (..., N), hit (..., N))."""
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-9, 1e-9, direction)
    o = origin
    # (..., 1, 3) vs (N, 3)
    t0 = (boxes[:, 0, :] - o) * inv_d[..., None, :]
    t1 = (boxes[:, 1, :] - o) * inv_d[..., None, :]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_far >= jnp.maximum(t_near, 1e-3))
    return jnp.where(hit, jnp.maximum(t_near, 1e-3), jnp.inf), hit


def render(K: Intrinsics, T_w_c: jnp.ndarray, world: World,
           height: int, width: int,
           box_offset: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, ...]:
    """Render one view.

    Args:
      T_w_c: camera-to-world pose (4, 4).
      box_offset: (N, 3) per-box world translation for this frame (moving
        objects); None = zeros.

    Returns: (intensity (H,W), depth (H,W) camera-frame z, semantic (H,W)
      int32 class ids, moving_mask (H,W) bool).
    """
    uv = pixel_grid(height, width)
    d_cam = jnp.stack([
        (uv[..., 0] - K.cx) / K.fx,
        (uv[..., 1] - K.cy) / K.fy,
        jnp.ones((height, width), jnp.float32)], axis=-1)
    R = T_w_c[:3, :3]
    origin = T_w_c[:3, 3]
    d_world = jnp.einsum("ij,hwj->hwi", R, d_cam)

    boxes = world.boxes
    if box_offset is not None:
        boxes = boxes + box_offset[:, None, :]

    # ground plane y = ground_y (normal points up i.e. -y)
    t_ground = (world.ground_y - origin[1]) / jnp.where(
        jnp.abs(d_world[..., 1]) < 1e-9, 1e-9, d_world[..., 1])
    t_ground = jnp.where(t_ground > 1e-3, t_ground, jnp.inf)

    # backdrop plane z = backdrop_z (in world frame)
    t_back = (world.backdrop_z - origin[2]) / jnp.where(
        jnp.abs(d_world[..., 2]) < 1e-9, 1e-9, d_world[..., 2])
    t_back = jnp.where(t_back > 1e-3, t_back, jnp.inf)

    if boxes.shape[0] > 0:
        t_boxes, _ = _intersect_boxes(origin, d_world, boxes)  # (H, W, N)
        t_box_min = jnp.min(t_boxes, axis=-1)
        box_id = jnp.argmin(t_boxes, axis=-1)
    else:
        t_box_min = jnp.full((height, width), jnp.inf)
        box_id = jnp.zeros((height, width), jnp.int32)

    t_all = jnp.stack([t_ground, t_back, t_box_min], axis=-1)
    prim = jnp.argmin(t_all, axis=-1)  # 0 ground, 1 backdrop, 2 box
    t_hit = jnp.min(t_all, axis=-1)

    p_world = origin + d_world * t_hit[..., None]
    intensity = _texture(p_world)
    # sky: rays that hit nothing (looking up) — flat low intensity
    sky = ~jnp.isfinite(t_hit)
    intensity = jnp.where(sky, 0.55, intensity)

    box_sem = (world.box_class[box_id] if world.box_class.shape[0] > 0
               else jnp.full((height, width), CLASS_BUILDING, jnp.int32))
    semantic = jnp.where(
        prim == 0, CLASS_ROAD,
        jnp.where(prim == 1, CLASS_BUILDING, box_sem))
    semantic = jnp.where(sky, CLASS_SKY, semantic).astype(jnp.int32)

    # camera-frame depth (z along optical axis), not ray length
    p_cam = se3.transform_points(se3.inverse(T_w_c),
                                 p_world.reshape(-1, 3)).reshape(height, width, 3)
    depth = jnp.where(sky, 0.0, p_cam[..., 2])

    moving = jnp.zeros((height, width), bool)
    if world.moving_index >= 0:
        moving = (prim == 2) & (box_id == world.moving_index) & ~sky
    return intensity, depth, semantic, moving


def right_camera_pose(T_w_cl: jnp.ndarray, baseline: jnp.ndarray) -> jnp.ndarray:
    """Right camera = left shifted by +baseline along camera x."""
    shift = se3.make(jnp.eye(3), jnp.stack(
        [jnp.asarray(baseline, jnp.float32), jnp.zeros(()), jnp.zeros(())]))
    return se3.compose(T_w_cl, shift)


def straight_trajectory(n_frames: int, speed: float = 0.8,
                        yaw_rate: float = 0.0) -> jnp.ndarray:
    """(N, 4, 4) camera-to-world poses: forward motion + optional yaw."""
    def step(T, _):
        xi = jnp.array([0.0, 0.0, speed, 0.0, yaw_rate, 0.0], jnp.float32)
        T = se3.compose(T, se3.exp(xi))
        return T, T
    _, traj = jax.lax.scan(step, se3.identity(), None, length=n_frames - 1)
    return jnp.concatenate([se3.identity()[None], traj], axis=0)


def render_sequence(K: Intrinsics, world: World, poses_w_c: jnp.ndarray,
                    height: int, width: int):
    """Render a full stereo sequence.

    Returns dict of stacked arrays: left/right (F,H,W), depth/semantic/
    moving for the left camera, and the GT poses.
    """
    n_boxes = world.boxes.shape[0]

    def one(i, T):
        if world.moving_index >= 0 and world.moving_velocity is not None:
            offs = jnp.zeros((n_boxes, 3)).at[world.moving_index].set(
                world.moving_velocity * i.astype(jnp.float32))
        else:
            offs = None
        L, depth, sem, mov = render(K, T, world, height, width, offs)
        Tr = right_camera_pose(T, K.baseline)
        Rimg, _, _, _ = render(K, Tr, world, height, width, offs)
        return L, Rimg, depth, sem, mov

    idx = jnp.arange(poses_w_c.shape[0])
    L, Rt, depth, sem, mov = jax.lax.map(lambda args: one(*args),
                                         (idx, poses_w_c))
    return dict(left=L, right=Rt, depth=depth, semantic=sem, moving=mov,
                poses=poses_w_c)
