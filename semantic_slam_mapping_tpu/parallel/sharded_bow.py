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
