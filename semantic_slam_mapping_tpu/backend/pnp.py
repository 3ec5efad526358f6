"""Motion-only bundle adjustment (PnP) with robust re-weighting.

Replaces the reference's g2o-based ``PnPSolver`` (reference: src/pnp.cpp —
one SE3 expmap vertex + one monocular projection edge per 3D-2D match,
Huber delta = sqrt(5.991), dense solver + Levenberg, 4 rounds x 10
iterations with chi^2 > 5.991 outlier demotion between rounds,
pnp.cpp:65-100; ``solvePnPLazy`` gate at :120-226 returning
{numFeatureMatches, numInliers, T}; thresholds pnp_min_inliers=10 /
pnp_min_matches=15 from parameters.txt:75-76).

TPU design: the g2o graph disappears — the problem IS its normal equations.
Each LM iteration builds the 6x6 system with `vmap`-batched analytic
(autodiff) Jacobians, Huber IRLS weights, and a chi^2 activity mask that
replaces g2o's edge levels. Rounds and iterations are `lax.scan`s with
fixed trip counts; batching over many PnP problems (the pose graph solves
nearby-keyframe PnPs in bulk) is one more `vmap` axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import PnpConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics, project
from semantic_slam_mapping_tpu.ops import matching


class PnpResult(NamedTuple):
    T: jnp.ndarray           # (4, 4) world(ref-cam)->cur-cam
    inliers: jnp.ndarray     # (N,) bool
    n_inliers: jnp.ndarray
    success: jnp.ndarray
    chi2: jnp.ndarray        # scalar robust total chi^2 over active edges


def _residuals(T: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray,
               K: Intrinsics) -> jnp.ndarray:
    return uv - project(K, se3.transform_points(T, X))


@partial(jax.jit, static_argnames=("cfg",))
def solve_pnp(X: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
              K: Intrinsics, T_init: jnp.ndarray,
              cfg: PnpConfig = PnpConfig()) -> PnpResult:
    """Robust motion-only BA.

    X: (N, 3) 3D points in the reference camera frame.
    uv: (N, 2) observations in the current image.
    T_init: (4, 4) initial relative pose (the reference initializes from the
    frames' relative pose, pnp.cpp:120-226).
    """
    delta = cfg.huber_delta
    chi2_th = cfg.chi2_threshold

    def lm_iter(T, active_w):
        def r_of(d):
            return _residuals(se3.compose(se3.exp(d), T), X, uv, K)
        r = r_of(jnp.zeros(6))
        J = jax.jacfwd(r_of)(jnp.zeros(6))               # (N, 2, 6)
        rn = jnp.linalg.norm(r, axis=-1)
        huber_w = jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-9))
        w = active_w * huber_w
        Jw = J * w[:, None, None]
        H = jnp.einsum("nri,nrj->ij", Jw, J,
                       precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("nri,nr->i", Jw, r,
                       precision=jax.lax.Precision.HIGHEST)
        H = H + 1e-6 * jnp.eye(6)
        d = -jnp.linalg.solve(H, g)
        ok = jnp.all(jnp.isfinite(d))
        return se3.compose(se3.exp(jnp.where(ok, d, 0.0)), T)

    def round_body(carry, _):
        T, active = carry
        w = active.astype(jnp.float32) * valid.astype(jnp.float32)
        T = jax.lax.fori_loop(
            0, cfg.iters_per_round, lambda i, t: lm_iter(t, w), T)
        # chi^2 re-gating between rounds (the g2o setLevel dance,
        # pnp.cpp:78-96): exclude edges with chi^2 > 5.991, readmit if back
        # under threshold
        r = _residuals(T, X, uv, K)
        chi2 = jnp.sum(r * r, axis=-1)
        active = chi2 <= chi2_th
        return (T, active), None

    active0 = jnp.ones_like(valid)
    (T, active), _ = jax.lax.scan(
        round_body, (T_init, active0), None, length=cfg.rounds)

    r = _residuals(T, X, uv, K)
    chi2_i = jnp.sum(r * r, axis=-1)
    inl = valid & (chi2_i <= chi2_th)
    n_inl = jnp.sum(inl)
    # robust total chi2 over surviving edges (what the pose graph
    # accumulates into its local/loop error, pose_graph.cpp:164-178)
    rho = jnp.where(chi2_i <= delta ** 2, chi2_i,
                    2.0 * delta * jnp.sqrt(chi2_i) - delta ** 2)
    total = jnp.sum(jnp.where(inl, rho, 0.0))
    return PnpResult(T=T, inliers=inl, n_inliers=n_inl,
                     success=(n_inl >= cfg.min_inliers)
                     & jnp.all(jnp.isfinite(T)),
                     chi2=total)


class PnpInformation(NamedTuple):
    """The reference's PNP_INFORMATION gate record (pnp.h:16-23)."""

    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    T: jnp.ndarray
    success: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg", "knn_ratio"))
def solve_pnp_lazy(desc_ref: jnp.ndarray, xyz_ref: jnp.ndarray,
                   valid_ref: jnp.ndarray,
                   desc_cur: jnp.ndarray, xy_cur: jnp.ndarray,
                   valid_cur: jnp.ndarray,
                   K: Intrinsics, T_init: jnp.ndarray,
                   cfg: PnpConfig = PnpConfig(),
                   knn_ratio: float = 0.8) -> PnpInformation:
    """ORB-match two frames then PnP (solvePnPLazy, pnp.cpp:120-226):
    the pose-graph edge gate. xyz_ref are reference-frame 3D points of the
    reference features (invalid depth -> valid_ref False)."""
    m = matching.match_descriptors(desc_ref, desc_cur, valid_ref, valid_cur,
                                   ratio=knn_ratio)
    idx = jnp.clip(m.idx, 0, xy_cur.shape[0] - 1)
    uv = xy_cur[idx]
    pair_valid = m.valid & valid_ref
    n_matches = jnp.sum(pair_valid)
    res = solve_pnp(xyz_ref, uv, pair_valid, K, T_init, cfg)
    success = res.success & (n_matches >= cfg.min_matches)
    return PnpInformation(n_matches=n_matches, n_inliers=res.n_inliers,
                          T=res.T, success=success)
