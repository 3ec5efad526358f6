"""Edge-sharded pose-graph PCG via shard_map + psum.

The distributed replacement for Cholmod's role at scale (SURVEY.md §2.2 g2o
row, §2.3 "Graph/model sharding"): the Gauss-Newton matvec of
backend/pose_graph.py is embarrassingly parallel over edges — each device
holds an edge shard, computes its J_i x_i + J_j x_j contributions against a
replicated vertex-state vector, and the scatter-add reduction becomes a
`psum` over the data axis. Vertex state (M, 6) is tiny (keyframes), so
replicating it and psumming gradients is the right layout for ICI: one
all-reduce of M*6 floats per CG step.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from semantic_slam_mapping_tpu.backend import pose_graph as pg
from semantic_slam_mapping_tpu.config import PoseGraphConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.parallel.mesh import DATA_AXIS


def optimize_sharded(graph: pg.PoseGraph, free_mask: jnp.ndarray,
                     mesh: Mesh, cfg: PoseGraphConfig = PoseGraphConfig(),
                     iters: int = 10) -> pg.PoseGraph:
    """Same semantics as backend.pose_graph.optimize, with the edge axis
    sharded over the mesh's data axis. Edge count must divide the data-axis
    size (pad with invalid edges — PoseGraph budgets already guarantee
    that when max_edges is a multiple of the mesh size)."""
    M = graph.poses.shape[0]
    n_data = mesh.shape[DATA_AXIS]
    E = graph.edge_T.shape[0]
    assert E % n_data == 0, (E, n_data)

    edge_spec = P(DATA_AXIS)
    rep = P()

    @partial(shard_map, mesh=mesh,
             in_specs=(rep, edge_spec, edge_spec, edge_spec, edge_spec,
                       edge_spec, rep),
             out_specs=rep)
    def gn_step_sharded(poses, e_i, e_j, e_T, e_info, e_valid, free):
        """One GN step: local-edge Jacobians, psum-reduced normal system,
        replicated PCG (state is (M,6) — tiny)."""
        local = pg.PoseGraph(
            poses=poses, vertex_valid=jnp.ones(M, bool),
            edge_i=e_i, edge_j=e_j, edge_T=e_T, edge_info=e_info,
            edge_valid=e_valid, edge_is_loop=jnp.zeros_like(e_valid))
        r, J_i, J_j = pg._edge_jacobians(local)
        w = pg._robust_weights(r, e_info, cfg.huber_delta) * \
            e_valid.astype(jnp.float32)

        def matvec(x):
            xf = x * free
            y = (jnp.einsum("erk,ek->er", J_i, xf[e_i])
                 + jnp.einsum("erk,ek->er", J_j, xf[e_j])) * w[:, None]
            out = jnp.zeros_like(x)
            out = out.at[e_i].add(jnp.einsum("erk,er->ek", J_i, y))
            out = out.at[e_j].add(jnp.einsum("erk,er->ek", J_j, y))
            out = jax.lax.psum(out, DATA_AXIS)      # <- the ICI all-reduce
            return (out + 1e-6 * x) * free

        wr = r * w[:, None]
        b = jnp.zeros((M, 6))
        b = b.at[e_i].add(jnp.einsum("erk,er->ek", J_i, wr))
        b = b.at[e_j].add(jnp.einsum("erk,er->ek", J_j, wr))
        b = -jax.lax.psum(b, DATA_AXIS) * free

        Hi = jnp.einsum("eri,erj->eij", J_i, J_i * w[:, None, None])
        Hj = jnp.einsum("eri,erj->eij", J_j, J_j * w[:, None, None])
        blocks = jnp.zeros((M, 6, 6)).at[e_i].add(Hi).at[e_j].add(Hj)
        blocks = jax.lax.psum(blocks, DATA_AXIS) + 1e-5 * jnp.eye(6)
        pre = jnp.linalg.inv(blocks)
        apply_pre = lambda v: jnp.einsum("mij,mj->mi", pre, v) * free

        x0 = jnp.zeros((M, 6))
        r0 = b - matvec(x0)
        z0 = apply_pre(r0)

        def pcg_body(carry, _):
            x, rr, z, p = carry
            Ap = matvec(p)
            rz = jnp.sum(rr * z)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-12)
            x = x + alpha * p
            r_new = rr - alpha * Ap
            z_new = apply_pre(r_new)
            beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-12)
            return (x, r_new, z_new, z_new + beta * p), None

        (dx, *_), _ = jax.lax.scan(pcg_body, (x0, r0, z0, z0), None,
                                   length=cfg.pcg_iters)
        dx = jnp.clip(dx, -1.0, 1.0)
        new_poses = se3.compose(se3.exp(dx), poses)
        return jnp.where((free > 0)[..., None], new_poses, poses)

    free = (free_mask & graph.vertex_valid).astype(jnp.float32)[:, None]
    poses = graph.poses
    step = jax.jit(gn_step_sharded)   # lower/compile once, reuse per iter
    for _ in range(iters):
        poses = step(poses, graph.edge_i, graph.edge_j,
                     graph.edge_T, graph.edge_info,
                     graph.edge_valid, free)
    return graph._replace(poses=se3.orthonormalize(poses))
