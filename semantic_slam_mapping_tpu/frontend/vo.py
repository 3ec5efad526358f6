"""Stereo visual odometry: RANSAC + Gauss-Newton over quad matches.

Replaces the reference's libviso2-style ``VisualOdometryStereo`` (reference:
src/vo_stereo.cpp — triangulate previous-frame points from stereo
(vo_stereo.cpp:75-80), 200 RANSAC iterations each running <=20 Gauss-Newton
steps on a 3-point sample (:91-117), inlier classification by 4-D stereo
reprojection error (:158-176), final refinement on all inliers (:120-136),
left-border reweighting (:317-319), 6x6 normal equations (:216-237)).

TPU design (SURVEY.md §7 step 10): the reference's *sequential* RANSAC loop
becomes one `vmap` over all hypotheses — 200 independent 3-point
Gauss-Newton solves run as a single batched kernel, then every hypothesis
scores every match in one (200, N) reprojection pass. Jacobians come from
`jax.jacfwd` of the exact stereo projection (replacing the hand-derived
analytic Jacobian at vo_stereo.cpp:275-365); the 6x6 solves are batched
`jnp.linalg.solve`. Fixed iteration counts with step-size masking replace
data-dependent convergence exits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import VoConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import (Intrinsics,
                                                       project_stereo,
                                                       triangulate_stereo)


class QuadMatches(NamedTuple):
    """Fixed-budget 4-view correspondences (the reference's vector<pmatch>,
    quadmatcher.hpp:33-49). All (N, 2) pixel coords [u, v]."""

    lp: jnp.ndarray   # left previous
    rp: jnp.ndarray   # right previous
    lc: jnp.ndarray   # left current
    rc: jnp.ndarray   # right current
    valid: jnp.ndarray  # (N,)


class VoResult(NamedTuple):
    T_delta: jnp.ndarray     # (4, 4) previous-cam -> current-cam motion
    inliers: jnp.ndarray     # (N,) bool (subset of matches.valid)
    n_inliers: jnp.ndarray   # scalar int32
    success: jnp.ndarray     # scalar bool
    mean_residual: jnp.ndarray


def _residuals(T: jnp.ndarray, X: jnp.ndarray, obs: jnp.ndarray,
               K: Intrinsics) -> jnp.ndarray:
    """4-D stereo reprojection residuals (N, 4) of previous-frame points X
    under motion T against current stereo observations obs=[ul,vl,ur,vr]."""
    Xc = se3.transform_points(T, X)
    return obs - project_stereo(K, Xc)


def _gn_refine(T0: jnp.ndarray, X: jnp.ndarray, obs: jnp.ndarray,
               w: jnp.ndarray, K: Intrinsics, iters: int,
               damping: float = 1e-6,
               step_tol: float = 0.0) -> jnp.ndarray:
    """Masked/weighted Gauss-Newton on SE(3): T <- exp(delta) T.
    w: (N,) weights (0 disables a point). Iteration count is fixed (TPU
    static shapes) but updates freeze once |delta| < step_tol — the
    reference's early-exit `if (norm < 1e-8) break` (vo_stereo.cpp:106,128)
    as a convergence mask."""

    def step(carry, _):
        T, done = carry

        def r_of(delta):
            return _residuals(se3.compose(se3.exp(delta), T), X, obs, K)
        r = r_of(jnp.zeros(6))
        J = jax.jacfwd(r_of)(jnp.zeros(6))          # (N, 4, 6)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nri,nrj->ij", Jw, J,
                       precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("nri,nr->i", Jw, r,
                       precision=jax.lax.Precision.HIGHEST)
        H = H + damping * jnp.eye(6)
        delta = -jnp.linalg.solve(H, g)
        ok = jnp.all(jnp.isfinite(delta)) & ~done
        T_new = se3.compose(se3.exp(jnp.where(ok, delta, 0.0)), T)
        done = done | (jnp.linalg.norm(delta) < step_tol)
        return (T_new, done), None

    (T, _), _ = jax.lax.scan(step, (T0, jnp.asarray(False)), None,
                             length=iters)
    return T


def _sq_err(T: jnp.ndarray, X: jnp.ndarray, obs: jnp.ndarray,
            K: Intrinsics) -> jnp.ndarray:
    r = _residuals(T, X, obs, K)
    return jnp.sum(r * r, axis=-1)


def _distinct3(key: jax.Array, n: jnp.ndarray) -> jnp.ndarray:
    """Three DISTINCT indices in [0, n) (the reference's getRandomSample
    draws until distinct, vo.cpp; with-replacement draws can produce a
    duplicated point and a rank-deficient 6-DoF sample — saved only by GN
    damping, and most likely exactly when matches are few)."""
    n = jnp.maximum(n, 3)
    r = jax.random.randint(key, (3,), 0, jnp.stack([n, n - 1, n - 2]))
    i0 = r[0]
    i1 = r[1] + (r[1] >= i0)
    a, b = jnp.minimum(i0, i1), jnp.maximum(i0, i1)
    i2 = r[2] + (r[2] >= a)
    i2 = i2 + (i2 >= b)
    return jnp.stack([i0, i1, i2])


@partial(jax.jit, static_argnames=("cfg",))
def estimate_motion(matches: QuadMatches, K: Intrinsics,
                    key: jax.Array,
                    cfg: VoConfig = VoConfig()) -> VoResult:
    """Full RANSAC + GN motion estimate from quad matches.

    Returns T mapping previous-camera coordinates to current-camera
    coordinates (the reference's Tr_delta; the tracker integrates
    pose <- pose * inv(T), track.cpp:82-87).
    """
    N = matches.valid.shape[0]
    disp = jnp.maximum(matches.lp[:, 0] - matches.rp[:, 0], 0.1)
    X = triangulate_stereo(K, matches.lp, disp)          # previous-frame 3D
    obs = jnp.concatenate([matches.lc, matches.rc], axis=-1)

    # left-border reweighting (vo_stereo.cpp:317-319): columns near the left
    # image border see larger stereo uncertainty
    if cfg.reweighting:
        w_geom = 1.0 / (jnp.abs(matches.lc[:, 0] - K.cx) / jnp.abs(K.cx)
                        + cfg.match_radius_reweight)
    else:
        w_geom = jnp.ones(N)
    w_valid = matches.valid.astype(jnp.float32)

    # ---- RANSAC hypotheses: sample 3 valid matches each ----
    order = jnp.argsort(~matches.valid)                  # valid first
    n_valid = jnp.sum(matches.valid)
    keys = jax.random.split(key, cfg.ransac_iters)

    def hypothesis(k):
        pick = _distinct3(k, n_valid)
        idx = order[pick]
        w = jnp.zeros(N).at[idx].set(1.0) * w_valid
        T = _gn_refine(se3.identity(), X, obs, w, K,
                       cfg.gn_iters_hypothesis, step_tol=cfg.gn_step_tol)
        err = _sq_err(T, X, obs, K)
        inl = (err < cfg.inlier_threshold ** 2) & matches.valid
        return T, jnp.sum(inl)

    Ts, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    T_best = Ts[best]

    # ---- final refinement on all inliers of the best hypothesis ----
    err = _sq_err(T_best, X, obs, K)
    inl = (err < cfg.inlier_threshold ** 2) & matches.valid
    w = inl.astype(jnp.float32) * w_geom
    T_final = _gn_refine(T_best, X, obs, w, K, cfg.gn_iters_refine,
                     step_tol=cfg.gn_step_tol)

    err_f = _sq_err(T_final, X, obs, K)
    inl_f = (err_f < cfg.inlier_threshold ** 2) & matches.valid
    n_inl = jnp.sum(inl_f)
    # success requires a usable support set (viso2 fails on degenerate
    # geometry; 6 points = well-posed 6-DoF)
    success = (n_inl >= 6) & jnp.all(jnp.isfinite(T_final))
    mean_res = jnp.sqrt(jnp.sum(jnp.where(inl_f, err_f, 0.0))
                        / jnp.maximum(n_inl, 1))
    return VoResult(T_delta=T_final, inliers=inl_f, n_inliers=n_inl,
                    success=success, mean_residual=mean_res)
