"""Keyframe-sharded BoW loop-candidate scoring.

The trajectory-length scaling axis (SURVEY.md §5 long-context row): the
reference's loop search is a host-side linear scan over every stored
keyframe (looper.cpp:5-18). backend/looper.py already turns that into one
batched kernel; this variant shards the keyframe database over the mesh's
data axis so each device scores its shard of BoW vectors and only the
(M,) score vector is gathered — the database itself (M x n_leaves floats,
the big array) never moves.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semantic_slam_mapping_tpu.parallel.mesh import DATA_AXIS


def shard_database(db_bows: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place the (M, n_leaves) BoW database sharded over keyframes.
    M must be a multiple of the data-axis size (pad with zero rows)."""
    return jax.device_put(db_bows, NamedSharding(mesh, P(DATA_AXIS)))


@partial(jax.jit, static_argnames=("mesh", "min_score", "min_interval"))
def get_possible_loops_sharded(bow: jnp.ndarray, db_bows: jnp.ndarray,
                               db_ids: jnp.ndarray, db_valid: jnp.ndarray,
                               query_id: jnp.ndarray, mesh: Mesh,
                               min_score: float, min_interval: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded equivalent of backend.looper.get_possible_loops."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    def score(q, db, ids, valid, qid):
        s = 1.0 - 0.5 * jnp.sum(jnp.abs(q[None, :] - db), axis=-1)
        gap = jnp.abs(qid - ids)
        mask = valid & (s > min_score) & (gap > min_interval)
        return s, mask

    return score(bow, db_bows, db_ids, db_valid, query_id)


@partial(jax.jit, static_argnames=("mesh", "min_score", "min_interval"))
def get_possible_loops_sparse_sharded(
        q_idx: jnp.ndarray, q_w: jnp.ndarray,
        db_idx: jnp.ndarray, db_w: jnp.ndarray,
        db_ids: jnp.ndarray, db_valid: jnp.ndarray,
        query_id: jnp.ndarray, mesh: Mesh,
        min_score: float, min_interval: int
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded scan of the PRODUCTION sparse BoW database (VERDICT r4
    missing 2): the (M, B) sorted-word-id/weight rows shard over the data
    axis; the per-row intersection score (searchsorted over each row's own
    sorted ids, backend.looper.sparse_l1_scores) is row-local, so the only
    replicated operand is the (B,) query and the only gathered output is
    the (M,) score/mask pair. This is the trajectory-length scaling axis
    (the reference's linear scan, looper.cpp:5-18) at DBoW2 scale —
    per-keyframe memory O(budget), independent of vocabulary size.
    M (db rows) must be a multiple of the data-axis size (the pipeline's
    pow2-grown db cap always is for pow2 meshes)."""
    from semantic_slam_mapping_tpu.backend.looper import (SparseBow,
                                                          sparse_l1_scores)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                       P(DATA_AXIS), P()),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    def score(qi, qw, dbi, dbw, ids, valid, qid):
        s = sparse_l1_scores(SparseBow(qi, qw), dbi, dbw)
        gap = jnp.abs(qid - ids)
        mask = valid & (s > min_score) & (gap > min_interval)
        return s, mask

    return score(q_idx, q_w, db_idx, db_w, db_ids, db_valid, query_id)
