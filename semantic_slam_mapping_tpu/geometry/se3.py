"""SE(3)/SO(3) Lie-group operations as pure jnp functions.

Replaces the reference's pose algebra spread across Eigen ``Isometry3d``,
the libviso2 ``Matrix_`` class (reference: include/matrix_.h:49-131,
src/matrix_.cpp — used for 4x4 pose composition in Tracker/PoseGraph,
track.cpp:82-87) and g2o's ``SE3Quat``. Everything here is batched-friendly
(`vmap` over leading axes) and differentiable; used as the parameterization
for VO Gauss-Newton, PnP, and the pose-graph optimizer.

Poses are 4x4 row-major homogeneous matrices (float32 by default — TPUs have
no fp64; accuracy is preserved by re-orthonormalization in long
compositions). Tangent vectors are ``[v, w]`` with translation first, i.e.
``exp([v, w]) = [[R, V v], [0, 1]]`` — matching the (rx,ry,rz,tx,ty,tz)
6-DoF parameterization of the reference VO (vo_stereo.cpp:91-136) up to
ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (…, 3) -> (…, 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (…, 3, 3) -> (…, 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, numerically safe at theta -> 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS)
    # Taylor fallbacks for tiny angles
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) -> unit quaternion (…, 4) [w, x, y, z], w >= 0.

    Branchless Shepperd's method: compute all four candidate extractions and
    select the numerically best (largest pivot) with `where` — TPU-friendly,
    robust at every rotation angle including pi."""
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    trace = r00 + r11 + r22

    # Four pivot candidates: 4w^2, 4x^2, 4y^2, 4z^2 (before sqrt)
    tw = 1.0 + trace
    tx = 1.0 + r00 - r11 - r22
    ty = 1.0 - r00 + r11 - r22
    tz = 1.0 - r00 - r11 + r22
    cand = jnp.stack([tw, tx, ty, tz], axis=-1)          # (…, 4)
    best = jnp.argmax(cand, axis=-1)                      # (…,)
    s = jnp.sqrt(jnp.clip(jnp.take_along_axis(
        cand, best[..., None], axis=-1)[..., 0], _EPS, None)) * 0.5
    inv4s = 1.0 / (4.0 * s)

    a01, a10 = R[..., 0, 1], R[..., 1, 0]
    a02, a20 = R[..., 0, 2], R[..., 2, 0]
    a12, a21 = R[..., 1, 2], R[..., 2, 1]

    q_w = jnp.stack([s, (a21 - a12) * inv4s, (a02 - a20) * inv4s,
                     (a10 - a01) * inv4s], axis=-1)
    q_x = jnp.stack([(a21 - a12) * inv4s, s, (a01 + a10) * inv4s,
                     (a02 + a20) * inv4s], axis=-1)
    q_y = jnp.stack([(a02 - a20) * inv4s, (a01 + a10) * inv4s, s,
                     (a12 + a21) * inv4s], axis=-1)
    q_z = jnp.stack([(a10 - a01) * inv4s, (a02 + a20) * inv4s,
                     (a12 + a21) * inv4s, s], axis=-1)

    b = best[..., None]
    q = jnp.where(b == 0, q_w, jnp.where(b == 1, q_x,
                                         jnp.where(b == 2, q_y, q_z)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of SO(3): (…, 3, 3) -> (…, 3). Safe near identity and pi
    (via quaternion: w = 2 atan2(|q_v|, q_w) * q_v/|q_v|)."""
    q = rotation_to_quaternion(R)
    qw, qv = q[..., 0], q[..., 1:]
    n = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(n, qw)
    scale = jnp.where(n < 1e-7, 2.0 / jnp.maximum(qw, _EPS),
                      theta / jnp.maximum(n, _EPS))
    return qv * scale[..., None]


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V such that exp_se3 translation = V v."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    b = (1.0 - jnp.cos(theta)) / (theta2 + _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    half_theta = 0.5 * theta
    cot = half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS)
    k = (1.0 - cot) / (theta2 + _EPS)
    small = theta2 < 1e-8
    k = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, k)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + k[..., None, None] * W2


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exp map: (…, 6) tangent [v, w] -> (…, 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(w), v)
    return make(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map: (…, 4, 4) -> (…, 6) tangent [v, w]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = so3_log(R)
    v = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(w), t)
    return jnp.concatenate([v, w], axis=-1)


def make(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (…, 4, 4) from (…, 3, 3) rotation and (…, 3) translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (cheaper + exacter than linalg.inv)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t,
                                precision=jax.lax.Precision.HIGHEST))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """SE(3) product at full f32 precision.

    On TPU the `@` operator defaults to bf16 MXU passes, which drifts pose
    chains off SO(3) within a few hundred compositions — always compose
    poses through this function (or under jax.default_matmul_precision)."""
    return jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (…, 4, 4) to points (…, N, 3) -> (…, N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back to SO(3) via symmetric orthogonalization
    (needed for long f32 pose chains; replaces fp64 accumulation of the
    reference's Matrix_ pose products, track.cpp:82-87)."""
    R = T[..., :3, :3]
    # Two Newton iterations of R (3I - R^T R)/2 — cheap polar decomposition.
    # Full precision: bf16 MXU passes here would defeat the purpose.
    hi = jax.lax.Precision.HIGHEST
    for _ in range(2):
        RtR = jnp.matmul(jnp.swapaxes(R, -1, -2), R, precision=hi)
        R = jnp.matmul(
            R, 1.5 * jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), RtR.shape)
            - 0.5 * RtR, precision=hi)
    return make(R, T[..., :3, 3])


def translation_norm(T: jnp.ndarray) -> jnp.ndarray:
    """‖t‖ of a relative pose (reference: utils.h:16-19 normofTransform)."""
    return jnp.linalg.norm(T[..., :3, 3], axis=-1)


def rotation_angle(T: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (rad) of a relative pose (reference: utils.h:21-24)."""
    return jnp.linalg.norm(so3_log(T[..., :3, :3]), axis=-1)


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of SE(3) acting on [v, w] tangents: (…, 6, 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat(t) @ R
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
