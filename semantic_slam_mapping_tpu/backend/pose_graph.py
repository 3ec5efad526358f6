"""SE(3) pose-graph optimization: Gauss-Newton with Huber robustness and a
matrix-free block-Jacobi-preconditioned conjugate-gradient linear solver.

Replaces the reference's g2o ``SparseOptimizer`` with ``BlockSolver<6,3>`` +
Cholmod + Levenberg (reference: pose_graph.h:53-64) and its optimization
policies (pose_graph.cpp:238-296 — global: all vertices free, vertex 0
fixed, 10 iterations; local: only the last ``local_window`` vertices free).

TPU design (SURVEY.md §2.2 g2o row): the sparse 6x6-block Cholesky is
replaced by PCG whose matvec is two edge-indexed gathers + one scatter-add —
exactly the shape that shards over a keyframe-partitioned mesh with `psum`
reductions (parallel/ shards it; the math here is mesh-oblivious). Edge
residuals r = log(T_meas^-1 T_i^-1 T_j) with autodiff Jacobians under
`vmap`; Huber as IRLS weights; vertex fixing via masks (the g2o
``setFixed`` role). Everything is fixed-budget: M vertex slots, E edge
slots, validity masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_mapping_tpu.config import PoseGraphConfig
from semantic_slam_mapping_tpu.geometry import se3


class PoseGraph(NamedTuple):
    """Fixed-budget pose graph (M vertex slots, E edge slots)."""

    poses: jnp.ndarray        # (M, 4, 4) T_w_c per keyframe
    vertex_valid: jnp.ndarray  # (M,) bool
    edge_i: jnp.ndarray       # (E,) int32 source vertex
    edge_j: jnp.ndarray       # (E,) int32 target vertex
    edge_T: jnp.ndarray       # (E, 4, 4) measured T_i^-1 T_j (relative pose)
    edge_info: jnp.ndarray    # (E,) information weight (reference: 100)
    edge_valid: jnp.ndarray   # (E,) bool
    edge_is_loop: jnp.ndarray  # (E,) bool

    @classmethod
    def empty(cls, max_vertices: int, max_edges: int) -> "PoseGraph":
        M, E = max_vertices, max_edges
        eye = jnp.broadcast_to(jnp.eye(4), (M, 4, 4))
        return cls(poses=eye,
                   vertex_valid=jnp.zeros(M, bool),
                   edge_i=jnp.zeros(E, jnp.int32),
                   edge_j=jnp.zeros(E, jnp.int32),
                   edge_T=jnp.broadcast_to(jnp.eye(4), (E, 4, 4)),
                   edge_info=jnp.zeros(E),
                   edge_valid=jnp.zeros(E, bool),
                   edge_is_loop=jnp.zeros(E, bool))


def edge_residuals(graph: PoseGraph) -> jnp.ndarray:
    """(E, 6) residuals r_e = log(T_meas^-1 T_i^-1 T_j) (g2o EdgeSE3 error
    in se3 coordinates)."""
    Ti = graph.poses[graph.edge_i]
    Tj = graph.poses[graph.edge_j]
    rel = se3.compose(se3.inverse(Ti), Tj)
    return se3.log(se3.compose(se3.inverse(graph.edge_T), rel))


def edge_chi2(graph: PoseGraph) -> jnp.ndarray:
    """(E,) chi^2 per edge (information-weighted squared residual)."""
    r = edge_residuals(graph)
    return graph.edge_info * jnp.sum(r * r, axis=-1)


def _edge_jacobians(graph: PoseGraph) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]:
    """Residuals + Jacobians wrt left-perturbations of T_i and T_j:
    r(d_i, d_j) = log(T_meas^-1 (exp(d_i) T_i)^-1 exp(d_j) T_j).
    Returns (r (E,6), J_i (E,6,6), J_j (E,6,6))."""
    Ti = graph.poses[graph.edge_i]
    Tj = graph.poses[graph.edge_j]
    Tm = graph.edge_T

    def res(di, dj, Ti_, Tj_, Tm_):
        A = se3.compose(se3.exp(di), Ti_)
        B = se3.compose(se3.exp(dj), Tj_)
        return se3.log(se3.compose(se3.inverse(Tm_),
                                   se3.compose(se3.inverse(A), B)))

    z = jnp.zeros(6)
    r = jax.vmap(lambda a, b, m: res(z, z, a, b, m))(Ti, Tj, Tm)
    J_i = jax.vmap(lambda a, b, m: jax.jacfwd(
        lambda d: res(d, z, a, b, m))(z))(Ti, Tj, Tm)
    J_j = jax.vmap(lambda a, b, m: jax.jacfwd(
        lambda d: res(z, d, a, b, m))(z))(Ti, Tj, Tm)
    return r, J_i, J_j


def _robust_weights(r: jnp.ndarray, info: jnp.ndarray,
                    delta: float) -> jnp.ndarray:
    """Huber IRLS weight per edge (scalar; multiplies the information)."""
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) * info + 1e-12)
    return info * jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-9))


def _lm_optimize(graph: PoseGraph, free: jnp.ndarray,
                 cfg: PoseGraphConfig, iters: int,
                 reduce_sum) -> jnp.ndarray:
    """The single LM+PCG optimizer body, shared by the single-device and the
    edge-sharded paths. ``reduce_sum`` reduces edge-scattered vertex
    quantities (and the scalar cost) across edge shards: identity on one
    device, ``lax.psum`` over the mesh data axis under shard_map
    (parallel/sharded_pcg.py). Having ONE body guarantees sharded ==
    single-device bit-for-bit modulo collective reduction order."""
    M = graph.poses.shape[0]

    def robust_cost(poses):
        g = graph._replace(poses=poses)
        r = edge_residuals(g)
        rn2 = graph.edge_info * jnp.sum(r * r, axis=-1)
        rn = jnp.sqrt(rn2 + 1e-12)
        d = cfg.huber_delta
        # Huber cost: quadratic core, linear tail
        c = jnp.where(rn <= d, rn2, 2.0 * d * rn - d * d)
        return reduce_sum(jnp.sum(jnp.where(graph.edge_valid, c, 0.0)))

    def lm_step(carry, _):
        # Levenberg-Marquardt (the reference's OptimizationAlgorithmLevenberg,
        # pose_graph.h:62): undamped Gauss-Newton DIVERGED on curved
        # keyframe chains with noisy wide-baseline nearby edges (vertices
        # moved >100 m in one solve); the damped step with accept/reject
        # keeps every iteration cost-decreasing.
        poses, lam = carry
        g = graph._replace(poses=poses)
        r, J_i, J_j = _edge_jacobians(g)
        w = _robust_weights(r, graph.edge_info, cfg.huber_delta) \
            * graph.edge_valid.astype(jnp.float32)

        ei, ej = graph.edge_i, graph.edge_j

        # block-Jacobi diagonal (also the LM damping metric)
        Hi = jnp.einsum("eri,erj->eij", J_i, J_i * w[:, None, None],
                        precision=jax.lax.Precision.HIGHEST)
        Hj = jnp.einsum("eri,erj->eij", J_j, J_j * w[:, None, None],
                        precision=jax.lax.Precision.HIGHEST)
        blocks = reduce_sum(
            jnp.zeros((M, 6, 6)).at[ei].add(Hi).at[ej].add(Hj))
        diag = jnp.diagonal(blocks, axis1=-2, axis2=-1)        # (M, 6)

        def matvec(x):
            """x: (M,6) -> (J^T W J + lam diag) x, fixed vertices projected."""
            xf = x * free
            y = (jnp.einsum("erk,ek->er", J_i, xf[ei],
                            precision=jax.lax.Precision.HIGHEST)
                 + jnp.einsum("erk,ek->er", J_j, xf[ej],
                              precision=jax.lax.Precision.HIGHEST))
            y = y * w[:, None]
            out = jnp.zeros_like(x)
            out = out.at[ei].add(jnp.einsum(
                "erk,er->ek", J_i, y, precision=jax.lax.Precision.HIGHEST))
            out = out.at[ej].add(jnp.einsum(
                "erk,er->ek", J_j, y, precision=jax.lax.Precision.HIGHEST))
            out = reduce_sum(out)
            damp = lam * (diag + 1e-6) * xf
            return (out + damp + 1e-6 * x) * free

        # gradient b = -J^T W r
        wr = r * w[:, None]
        b = jnp.zeros((M, 6))
        b = b.at[ei].add(jnp.einsum("erk,er->ek", J_i, wr,
                                    precision=jax.lax.Precision.HIGHEST))
        b = b.at[ej].add(jnp.einsum("erk,er->ek", J_j, wr,
                                    precision=jax.lax.Precision.HIGHEST))
        b = -reduce_sum(b) * free

        pre_blocks = blocks + (lam * (diag + 1e-6))[:, :, None] \
            * jnp.eye(6) + 1e-5 * jnp.eye(6)
        pre = jnp.linalg.inv(pre_blocks)

        def apply_pre(v):
            return jnp.einsum("mij,mj->mi", pre, v,
                              precision=jax.lax.Precision.HIGHEST) * free

        # ---- PCG ----
        x0 = jnp.zeros((M, 6))
        r0 = b - matvec(x0)
        z0 = apply_pre(r0)
        p0 = z0

        def pcg_body(carry, _):
            x, rr, z, p = carry
            Ap = matvec(p)
            rz = jnp.sum(rr * z)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
            x = x + alpha * p
            r_new = rr - alpha * Ap
            z_new = apply_pre(r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-12)
            p_new = z_new + beta * p
            return (x, r_new, z_new, p_new), jnp.sum(r_new * r_new)

        (dx, *_), _ = jax.lax.scan(pcg_body, (x0, r0, z0, p0), None,
                                   length=cfg.pcg_iters)
        dx = jnp.clip(dx, -1.0, 1.0)  # trust region on the se3 step
        cand = se3.compose(se3.exp(dx), poses)
        cand = jnp.where((free > 0)[..., None], cand, poses)
        # accept/reject (LM): only cost-decreasing steps are kept
        accept = robust_cost(cand) < robust_cost(poses)
        poses_new = jnp.where(accept, cand, poses)
        lam_new = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                            jnp.minimum(lam * 8.0, 1e4))
        return (poses_new, lam_new), None

    (poses, _), _ = jax.lax.scan(lm_step, (graph.poses, jnp.float32(1e-2)),
                                 None, length=iters)
    return se3.orthonormalize(poses)


@partial(jax.jit, static_argnames=("cfg", "iters"))
def optimize(graph: PoseGraph, free_mask: jnp.ndarray,
             cfg: PoseGraphConfig = PoseGraphConfig(),
             iters: int = 10) -> PoseGraph:
    """LM + PCG pose-graph solve (single device).

    free_mask: (M,) — vertices allowed to move (the reference fixes v0 for
    global solves, pose_graph.cpp:242-247, and all but the last 5 for local
    solves, :269-291).
    """
    free = (free_mask & graph.vertex_valid).astype(jnp.float32)[:, None]
    poses = _lm_optimize(graph, free, cfg, iters, lambda x: x)
    return graph._replace(poses=poses)


def local_free_mask(graph: PoseGraph, n_vertices: jnp.ndarray,
                    window: int) -> jnp.ndarray:
    """Free only the last ``window`` valid vertices (local optimize,
    pose_graph.cpp:269-291). Vertex 0 stays FIXED even when the window
    covers the whole graph: with every vertex free the relative-edge
    system loses its gauge and the damped solver can drift the entire
    graph wholesale — an early all-free local optimization offset a whole
    golden run by ~24 m (constant ATE, tiny RPE) before this guard."""
    idx = jnp.arange(graph.poses.shape[0])
    return ((idx >= jnp.maximum(n_vertices - window, 1))
            & (idx < n_vertices))


def global_free_mask(graph: PoseGraph) -> jnp.ndarray:
    """All vertices free except v0 (global optimize, pose_graph.cpp:242-247)."""
    idx = jnp.arange(graph.poses.shape[0])
    return graph.vertex_valid & (idx != 0)
