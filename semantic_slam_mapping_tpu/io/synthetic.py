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

# Semantic class ids used by the synthetic world — the CamVid/SegNet 12-class
# ids (mapping/semantics.py), so GT labels, SegNet training targets, and the
# mapper's class filters (reference: mapper.cpp:37-55,206-208) all agree.
from semantic_slam_mapping_tpu.mapping import semantics as _semcls

CLASS_SKY = _semcls.SKY
CLASS_ROAD = _semcls.ROAD
CLASS_BUILDING = _semcls.BUILDING
CLASS_CAR = _semcls.VEHICLE       # moving-object class (reference's vehicle)
CLASS_PEDESTRIAN = _semcls.PEDESTRIAN  # Pedestrian motion class (mapper.cpp:206)


class World(NamedTuple):
    """Static boxes (N, 2, 3) [min, max] world corners + per-box class ids
    (N,), ground height (scalar), backdrop depth (scalar)."""

    boxes: jnp.ndarray
    box_class: jnp.ndarray
    ground_y: jnp.ndarray
    backdrop_z: jnp.ndarray
    # per-box world velocity (N, 3) in units/frame; None = all static.
    # A box is "moving" (for GT masks) iff its velocity is nonzero — this
    # generalizes the round-1 single moving_index to the multi-vehicle
    # KITTI-statistics golden sequence (VERDICT r1 item 10).
    box_velocity: Optional[jnp.ndarray] = None


def _standing_boxes(cx, cz, w, ground):
    """Boxes standing on the ground from centers (N,), (N,) + extents (N,3)."""
    mins = jnp.stack([cx - w[:, 0], ground - w[:, 1] * 2.0, cz - w[:, 2]],
                     axis=-1)
    maxs = jnp.stack([cx + w[:, 0],
                      jnp.full_like(cx, ground + 0.01),
                      cz + w[:, 2]], axis=-1)
    return jnp.stack([mins, maxs], axis=1)


def make_world(key: jax.Array, n_boxes: int = 12, camera_height: float = 1.65,
               backdrop_z: float = 120.0, with_moving_box: bool = False,
               n_moving: int = 0) -> World:
    """Random street-like world: boxes standing on the ground, flanking a
    central corridor the camera drives through. ``with_moving_box`` adds the
    round-1 single lateral car; ``n_moving`` adds that many independently
    moving vehicles/pedestrians spread along the corridor."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    side = jnp.where(jax.random.bernoulli(k1, 0.5, (n_boxes,)), 1.0, -1.0)
    cx = side * jax.random.uniform(k2, (n_boxes,), minval=4.0, maxval=14.0)
    cz = jax.random.uniform(k3, (n_boxes,), minval=6.0, maxval=90.0)
    w = jax.random.uniform(k4, (n_boxes, 3), minval=1.0, maxval=4.0)
    w = w * jnp.array([1.0, 1.5, 1.0])  # taller than wide
    ground = jnp.asarray(camera_height, jnp.float32)
    boxes = _standing_boxes(cx, cz, w, ground)
    box_class = jnp.full((n_boxes,), CLASS_BUILDING, jnp.int32)
    vel = jnp.zeros((n_boxes, 3), jnp.float32)

    if with_moving_box:
        # a car-sized box in the corridor ahead, moving laterally
        car_min = jnp.array([[-1.0, ground - 1.5, 14.0]])
        car_max = jnp.array([[1.0, ground, 17.0]])
        boxes = jnp.concatenate([boxes, jnp.stack([car_min, car_max], 1)], 0)
        box_class = jnp.concatenate(
            [box_class, jnp.array([CLASS_CAR], jnp.int32)])
        vel = jnp.concatenate(
            [vel, jnp.array([[0.35, 0.0, 0.1]], jnp.float32)], 0)

    if n_moving > 0:
        km1, km2, km3 = jax.random.split(k5, 3)
        mz = jnp.linspace(12.0, 60.0, n_moving) + \
            jax.random.uniform(km1, (n_moving,), minval=-2.0, maxval=2.0)
        mx = jax.random.uniform(km2, (n_moving,), minval=-2.5, maxval=2.5)
        is_ped = jnp.arange(n_moving) % 3 == 2
        # pedestrians stay near (5..20 m) — far-away 1.8 m boxes subtend a
        # handful of pixels and teach the segmenter nothing
        mz = jnp.where(is_ped, 5.0 + 0.3 * (mz - 12.0), mz)
        half = jnp.where(is_ped[:, None],
                         jnp.array([[0.3, 0.9, 0.3]]),
                         jnp.array([[1.0, 0.75, 1.6]]))
        mmin = jnp.stack([mx - half[:, 0], ground - 2 * half[:, 1], mz - half[:, 2]], -1)
        mmax = jnp.stack([mx + half[:, 0],
                          jnp.full_like(mx, ground + 0.01), mz + half[:, 2]], -1)
        boxes = jnp.concatenate([boxes, jnp.stack([mmin, mmax], 1)], 0)
        box_class = jnp.concatenate(
            [box_class, jnp.where(is_ped, CLASS_PEDESTRIAN,
                                  CLASS_CAR).astype(jnp.int32)])
        # independent velocities: cars drive along z (with/against camera),
        # pedestrians cross laterally
        vz = jnp.where(is_ped, 0.0,
                       jax.random.uniform(km3, (n_moving,),
                                          minval=-0.5, maxval=0.6))
        vx = jnp.where(is_ped, 0.25, 0.05 * jnp.sign(mx))
        vel = jnp.concatenate(
            [vel, jnp.stack([vx, jnp.zeros_like(vx), vz], -1)], 0)

    if not with_moving_box and n_moving == 0:
        vel = None
    return World(boxes, box_class, ground,
                 jnp.asarray(backdrop_z, jnp.float32), vel)


def _value_noise(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Non-periodic value noise in [-1, 1]: sin-hash values on the integer
    lattice of (u, v), smoothstep-bilinearly interpolated. Breaks the pure
    periodicity of the sinusoid octaves (periodic texture is ambiguous for
    stereo matching along the epipolar line)."""
    ui, vi = jnp.floor(u), jnp.floor(v)
    uf, vf = u - ui, v - vi

    def rnd(cu, cv):
        h = jnp.sin(cu * 127.1 + cv * 311.7) * 43758.5453
        return 2.0 * (h - jnp.floor(h)) - 1.0

    wu = uf * uf * (3.0 - 2.0 * uf)
    wv = vf * vf * (3.0 - 2.0 * vf)
    n0 = rnd(ui, vi) * (1 - wu) + rnd(ui + 1, vi) * wu
    n1 = rnd(ui, vi + 1) * (1 - wu) + rnd(ui + 1, vi + 1) * wu
    return n0 * (1 - wv) + n1 * wv


def _texture(p: jnp.ndarray, seed_scale: float = 1.0,
             footprint: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Procedural world texture in [0, 1]: fractal (multi-octave) value
    noise — non-periodic and isotropic on EVERY surface orientation, so
    KLT/GFTT/SGBM see trackable 2D structure at all scales (real KITTI
    scenes have texture at every scale; earlier sinusoid-interference
    octaves were periodic along epipolar lines and near-constant along the
    vertical on box faces, which made chained KLT legs slide — both our
    tracker and OpenCV's drifted identically on them, tools/probe_klt_ab).

    The height coordinate y is mixed into BOTH noise arguments with O(1)
    coefficients so vertical surfaces (x or z constant) still get full 2D
    variation — the old 0.37y/0.29y mixing left near-1D stripes there.

    ``footprint`` (meters subtended by one pixel at the hit point, t/fx)
    enables mip-style level-of-detail: each octave fades out smoothly as
    the pixel footprint approaches a quarter of its wavelength, the way a
    real camera integrates sub-pixel detail; without it the fine octaves
    alias into shimmering single-pixel speckle on distant surfaces.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    def lod(wavelength: float) -> jnp.ndarray:
        if footprint is None:
            return jnp.float32(1.0)
        lam4 = wavelength * 0.25
        return jax.nn.sigmoid((lam4 - footprint) / (wavelength / 12.0))

    # octaves: (cells/metre, amplitude, phase offsets). Wavelength of one
    # octave = two lattice cells = 2/freq metres. Amplitude INCREASES with
    # frequency (asphalt grain / brick detail is the high-contrast content
    # of street scenes): near surfaces, where the fine octaves survive the
    # LOD, score far higher GFTT response than distant ones — so the
    # fixed-budget detector fills with near-field (usable-disparity)
    # corners, matching real KITTI corner statistics.
    octaves = (
        (0.25, 0.16, 0.0, 7.3),
        (0.70, 0.20, 3.1, 1.7),
        (2.00, 0.24, 9.2, 4.8),
        (5.50, 0.30, 1.3, 6.1),
        (15.0, 0.36, 5.7, 2.9),
        (40.0, 0.36, 8.4, 0.6),
    )
    u = (x + 0.83 * y) * seed_scale
    w = z + 0.61 * y
    v = jnp.zeros_like(x)
    for f, a, pu, pw in octaves:
        v = v + a * lod(2.0 / f) * _value_noise(f * u + pu, f * w + pw)
    return 0.5 + 0.5 * jnp.tanh(1.8 * v)


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
    # pixel footprint in meters at the hit point (mip LOD for _texture);
    # rays that hit nothing get a finite dummy (overwritten by sky below)
    footprint = jnp.where(jnp.isfinite(t_hit), t_hit, 0.0) / K.fx
    intensity = _texture(p_world, footprint=footprint)
    sky = ~jnp.isfinite(t_hit)

    box_sem = (world.box_class[box_id] if world.box_class.shape[0] > 0
               else jnp.full((height, width), CLASS_BUILDING, jnp.int32))
    semantic = jnp.where(
        prim == 0, CLASS_ROAD,
        jnp.where(prim == 1, CLASS_BUILDING, box_sem))
    semantic = jnp.where(sky, CLASS_SKY, semantic).astype(jnp.int32)

    # class-correlated albedo (gain, bias): real scenes separate classes by
    # APPEARANCE, not just layout — asphalt is dark and matte, vehicle
    # paint is low-contrast mid-grey, clothing is dark. Without this every
    # class shared one texture and the segmenter could only learn layout
    # priors (static pedestrians were labeled Vehicle). Texture detail is
    # preserved under each affine, so VO/KLT statistics stay KITTI-like.
    gain = jnp.full_like(intensity, 1.0)
    bias = jnp.zeros_like(intensity)
    # bands chosen to overlap as little as real albedo statistics allow:
    # road 0.25-0.70, vehicle 0.45-0.75, pedestrian 0.02-0.27, building 0-1
    for cls, g, b in ((CLASS_ROAD, 0.45, 0.25),
                      (CLASS_CAR, 0.30, 0.45),
                      (CLASS_PEDESTRIAN, 0.25, 0.02)):
        sel = semantic == cls
        gain = jnp.where(sel, g, gain)
        bias = jnp.where(sel, b, bias)
    intensity = jnp.clip(bias + gain * intensity, 0.0, 1.0)
    # sky: rays that hit nothing (looking up) — flat low intensity
    intensity = jnp.where(sky, 0.55, intensity)

    # camera-frame depth (z along optical axis), not ray length
    p_cam = se3.transform_points(se3.inverse(T_w_c),
                                 p_world.reshape(-1, 3)).reshape(height, width, 3)
    depth = jnp.where(sky, 0.0, p_cam[..., 2])

    moving = jnp.zeros((height, width), bool)
    if world.box_velocity is not None:
        is_moving = jnp.any(world.box_velocity != 0.0, axis=-1)  # (N,)
        moving = (prim == 2) & is_moving[box_id] & ~sky
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


def loop_trajectory(n_frames: int, radius: float = 30.0,
                    laps: float = 1.2, pitch_amp: float = 0.0,
                    revisit_offset: float = 0.0) -> jnp.ndarray:
    """(N, 4, 4) poses driving a circle of ``radius`` (center to camera's
    right), heading along the tangent. ``laps`` > 1 revisits the start
    region with frames to spare — the mid-run loop closure of the golden
    sequence (VERDICT r1 item 10). ``pitch_amp`` adds sinusoidal platform
    pitch (radians) to exercise the pitch-KF correction loop.

    ``revisit_offset`` (m) widens the circle radius on the SECOND lap
    (smooth ramp over the first quarter-lap past 2pi), so the revisit
    passes the start region in a parallel lane instead of retracing it
    exactly — loop candidates then see a laterally-offset viewpoint and
    their PnP inlier counts drop into the borderline 12-50 band the
    inlier-scaled edge information exists for (VERDICT r4 item 6)."""
    th = jnp.linspace(0.0, 2.0 * jnp.pi * laps, n_frames)
    # ramp 0 -> 1 over the first 1/16 lap past 2pi (fast, so the WHOLE
    # revisit runs in the offset lane — a slow ramp leaves the early
    # revisit near-identical to lap 1 and its loops at full inlier
    # strength); circle center stays at (radius, 0)
    ramp = jnp.clip((th - 2.0 * jnp.pi) / (jnp.pi / 8.0), 0.0, 1.0)
    s = ramp * ramp * (3.0 - 2.0 * ramp)   # smoothstep
    r_eff = radius + revisit_offset * s
    pos = jnp.stack([radius - r_eff * jnp.cos(th),
                     jnp.zeros_like(th),
                     r_eff * jnp.sin(th)], axis=-1)
    yaw = th
    pitch = pitch_amp * jnp.sin(th * 7.0)

    def pose(y, p, t):
        cy, sy = jnp.cos(y), jnp.sin(y)
        cp, sp = jnp.cos(p), jnp.sin(p)
        Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
        Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cp, -sp], [0.0, sp, cp]])
        return se3.make(Ry @ Rx, t)
    return jax.vmap(pose)(yaw, pitch, pos)


def make_loop_world(key: jax.Array, n_boxes: int = 48, radius: float = 30.0,
                    camera_height: float = 1.65, corridor: float = 3.5,
                    n_moving: int = 0, backdrop_z: float = 1500.0) -> World:
    # backdrop at 1.5 km: far enough that mip LOD flattens its texture, so
    # GFTT's relative quality gate prunes backdrop corners instead of
    # letting them crowd out the near-field features VO can actually use
    # (min-disparity gate, vo_stereo.cpp via quadmatcher filtering)
    """World for :func:`loop_trajectory`: boxes scattered inside and outside
    the circular corridor (occluding each other along the ring), plus
    ``n_moving`` independently moving vehicles/pedestrians on the ring."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    ground = jnp.asarray(camera_height, jnp.float32)
    # Street-canyon statistics (KITTI sequences drive between near-
    # continuous facades): half the boxes form WALL SEGMENTS lining both
    # sides of the ring — elongated tangentially, nearly touching — so
    # every view has abundant near-field (disparity > 3) structure; the
    # rest is random scatter. A sparse ring left views dominated by the
    # 250 m backdrop, whose corners all fail the min-disparity VO gate.
    n_wall = n_boxes // 2
    n_scatter = n_boxes - n_wall
    # wall segments: alternate inner/outer, evenly spaced around the ring
    wang = jnp.linspace(0.0, 2.0 * jnp.pi, n_wall, endpoint=False) \
        + jax.random.uniform(k1, (n_wall,), minval=-0.04, maxval=0.04)
    w_inner = jnp.arange(n_wall) % 2 == 0
    wdr = jax.random.uniform(k2, (n_wall,), minval=corridor + 2.0,
                             maxval=corridor + 5.0)
    wr = jnp.maximum(jnp.where(w_inner, radius - wdr, radius + wdr), 2.0)
    wcx = radius - wr * jnp.cos(wang)
    wcz = wr * jnp.sin(wang)
    # tangential extent ~ arc spacing (walls nearly touch), radial ~1-2 m
    seg_len = 2.0 * jnp.pi * radius / n_wall * \
        jax.random.uniform(k3, (n_wall,), minval=0.45, maxval=0.7)
    seg_th = jax.random.uniform(k3, (n_wall,), minval=0.5, maxval=1.0)
    seg_h = jax.random.uniform(k4, (n_wall,), minval=2.5, maxval=5.0)
    # tangent direction at wang: (sin, cos); box is axis-aligned, so take
    # the dominant axis extent from the tangent projection
    tx, tz = jnp.abs(jnp.sin(wang)), jnp.abs(jnp.cos(wang))
    whx = 0.5 * (seg_len * tx + seg_th * (1 - tx))
    whz = 0.5 * (seg_len * tz + seg_th * (1 - tz))
    wall_w = jnp.stack([whx, seg_h * 0.5, whz], axis=-1)
    wall_boxes = _standing_boxes(wcx, wcz, wall_w, ground)

    ang = jax.random.uniform(k5, (n_scatter,), minval=0.0,
                             maxval=2.0 * jnp.pi)
    inner = jax.random.bernoulli(k6, 0.5, (n_scatter,))
    dr = jax.random.uniform(k7, (n_scatter,), minval=corridor + 1.5,
                            maxval=corridor + 13.0)
    r = jnp.where(inner, radius - dr, radius + dr)
    r = jnp.maximum(r, 2.0)
    cx = radius - r * jnp.cos(ang)
    cz = r * jnp.sin(ang)
    w = jax.random.uniform(k4, (n_scatter, 3), minval=1.0, maxval=4.0)
    w = w * jnp.array([1.0, 1.5, 1.0])
    boxes = jnp.concatenate([wall_boxes,
                             _standing_boxes(cx, cz, w, ground)], 0)
    box_class = jnp.full((n_boxes,), CLASS_BUILDING, jnp.int32)
    vel = jnp.zeros((n_boxes, 3), jnp.float32)

    if n_moving > 0:
        km1, km2 = jax.random.split(k5)
        # on-corridor movers spread over the first half lap, drifting
        # tangentially (cars) or crossing the corridor (pedestrians)
        mang = jnp.linspace(0.15, jnp.pi, n_moving) + \
            jax.random.uniform(km1, (n_moving,), minval=-0.05, maxval=0.05)
        mx = radius - radius * jnp.cos(mang)
        mz = radius * jnp.sin(mang)
        is_ped = jnp.arange(n_moving) % 3 == 2
        half = jnp.where(is_ped[:, None],
                         jnp.array([[0.3, 0.9, 0.3]]),
                         jnp.array([[1.0, 0.75, 1.6]]))
        mmin = jnp.stack([mx - half[:, 0], ground - 2 * half[:, 1],
                          mz - half[:, 2]], -1)
        mmax = jnp.stack([mx + half[:, 0],
                          jnp.full_like(mx, ground + 0.01),
                          mz + half[:, 2]], -1)
        boxes = jnp.concatenate([boxes, jnp.stack([mmin, mmax], 1)], 0)
        box_class = jnp.concatenate(
            [box_class, jnp.where(is_ped, CLASS_PEDESTRIAN,
                                  CLASS_CAR).astype(jnp.int32)])
        # tangent at mang: d/dθ (radius(1-cosθ), radiussinθ) ∝ (sinθ, cosθ)
        speed = jnp.where(is_ped, 0.12,
                          jax.random.uniform(km2, (n_moving,),
                                             minval=0.2, maxval=0.5))
        tx, tz = jnp.sin(mang), jnp.cos(mang)
        vx = jnp.where(is_ped, 0.12 * tz, speed * tx)   # peds cross (normal)
        vz = jnp.where(is_ped, -0.12 * tx, speed * tz)
        vel = jnp.concatenate(
            [vel, jnp.stack([vx, jnp.zeros_like(vx), vz], -1)], 0)

    return World(boxes, box_class, ground,
                 jnp.asarray(backdrop_z, jnp.float32),
                 vel if n_moving > 0 else None)


def render_sequence(K: Intrinsics, world: World, poses_w_c: jnp.ndarray,
                    height: int, width: int, start_index: int = 0):
    """Render a full stereo sequence.

    Returns dict of stacked arrays: left/right (F,H,W), depth/semantic/
    moving for the left camera, and the GT poses. ``start_index`` offsets
    the moving-box time base so long sequences can render in chunks.
    """
    def one(i, T):
        offs = (world.box_velocity * i.astype(jnp.float32)
                if world.box_velocity is not None else None)
        L, depth, sem, mov = render(K, T, world, height, width, offs)
        Tr = right_camera_pose(T, K.baseline)
        Rimg, _, _, _ = render(K, Tr, world, height, width, offs)
        return L, Rimg, depth, sem, mov

    idx = start_index + jnp.arange(poses_w_c.shape[0])
    L, Rt, depth, sem, mov = jax.lax.map(lambda args: one(*args),
                                         (idx, poses_w_c))
    return dict(left=L, right=Rt, depth=depth, semantic=sem, moving=mov,
                poses=poses_w_c)
